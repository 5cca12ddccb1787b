"""On-chip A/B of the keys kernel variants (round 5):

  layout pk|lp (lane-major vs candidate-major merge)
  x merge fori|unroll (K fori_loop extraction passes vs Python unroll)

plus an intersect-only ablation per layout (the merge-free floor: same
sweep, same early termination structure, but each chunk only min-reduces
t1 into a single row) to separate merge cost from sweep overhead.

Each variant runs in THIS process (env toggles are read at trace time,
and each variant jits a distinct kernel, so one process is fine).
Usage: python scripts/lpprobe.py [n] [w] [h] [--cand 1536] [--narrow 3]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)

import jax
import jax.numpy as jnp
import numpy as np


def _sync_floor():
    """Per-sync tunnel overhead (~30 ms/program-execution round on axon;
    a cached-array re-read costs ~0, so the old probe floor was a no-op).
    See scripts/keystage.py:_sync_floor."""
    null = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    _ = np.asarray(null(x))
    floors = []
    for _ in range(7):
        t0 = time.perf_counter()
        _ = np.asarray(null(x))
        floors.append(time.perf_counter() - t0)
    floors.sort()
    return floors[3]


_FLOOR = None


def timeit(label, fn, readout, iters=7):
    global _FLOOR
    _ = np.asarray(readout(fn()))
    if _FLOOR is None:
        _FLOOR = _sync_floor()
        print(f"(sync floor {_FLOOR*1e3:.1f} ms)")
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(readout(fn()))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = max(ts[len(ts) // 2] - _FLOOR, 0.0)
    lo = max(ts[0] - _FLOOR, 0.0)
    print(f"{label:24s} {dt*1e3:8.1f} ms   (min {lo*1e3:.1f})")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=100_000)
    ap.add_argument("w", type=int, nargs="?", default=640)
    ap.add_argument("h", type=int, nargs="?", default=384)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--cand", type=int, default=1536)
    ap.add_argument("--glob", type=int, default=128)
    ap.add_argument("--narrow", type=int, default=3)
    args = ap.parse_args()

    from rtgs_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from rtgs_tpu.camera import camera_from_fov
    from rtgs_tpu.ops import peel
    from rtgs_tpu.ops.peel import CHUNK
    from rtgs_tpu.render.binning import tile_candidates
    from rtgs_tpu.render.tiled import (_tile_pixel_features, pack_features,
                                       precompute_features)
    from rtgs_tpu.scene import random_scene
    from rtgs_tpu.viewer.orbit import orbit_camera_pose

    key = jax.random.PRNGKey(0)
    g = random_scene(key, args.n, extent=2.0, scale_range=(0.005, 0.03))
    jax.block_until_ready(g)
    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, (args.w, args.h), 60.0)
    bkw = dict(tile=(16, 16), max_candidates=args.cand,
               max_global=args.glob, narrow=args.narrow, chunk=CHUNK)
    binning = jax.jit(lambda gg: tile_candidates(gg, cam, **bkw))(g)
    cand = binning.candidates
    lb = binning.chunk_lb
    pix = _tile_pixel_features(cam, (16, 16))
    packed = jax.jit(
        lambda gg: pack_features(precompute_features(gg, cam)))(g)
    jax.block_until_ready((cand, lb, pix, packed))

    outs = {}
    for layout in ("pk", "lp"):
        for unroll in ("0", "1"):
            os.environ["RTGS_KEYS_LAYOUT"] = layout
            os.environ["RTGS_MERGE_UNROLL"] = unroll

            # Fresh jit per combo: the env toggles are trace-time, so give
            # each its own cache entry via a distinct wrapper identity.
            def run(p, _tag=(layout, unroll)):
                return peel.peel_keys_pallas(p, cand, pix, args.depth,
                                             chunk_lb=lb)

            f = jax.jit(run)
            tag = f"{layout} unroll={unroll}"
            try:
                timeit(tag, lambda: f(packed), lambda o: o[0][:1, 0, 0])
                outs[tag] = tuple(np.asarray(x) for x in f(packed))
            except Exception as e:  # e.g. pk needs CHUNK % 128 == 0
                print(f"{tag:24s} FAILED: {type(e).__name__}")

    ref = next(iter(outs.values()))
    reftag = next(iter(outs.keys()))
    for tag, o in outs.items():
        same = all(np.array_equal(a, b) for a, b in zip(ref, o))
        print(f"  {tag}: bitwise == {reftag}: {same}")

    # --- Floor isolation: how much of the kernel time is per-grid-step
    # overhead + the (bt, C, F) block DMA, independent of the sweep? ---
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rtgs_tpu.ops.peel import G_DIM, _counts, _gather

    gathered, _ = _gather(packed, cand)
    t, c, f = gathered.shape
    p = pix.shape[1]
    depth = args.depth

    def nothing_kernel(bmax_ref, feats_ref, pix_ref, out_ref):
        out_ref[...] = jnp.full_like(out_ref, jnp.inf)

    def touch_kernel(bmax_ref, feats_ref, pix_ref, out_ref):
        # Forces the block to be read: one pass of sums over the feats.
        x = feats_ref[...]
        out_ref[...] = jnp.broadcast_to(
            jnp.sum(x, axis=(1,), keepdims=True)[..., :1],
            out_ref.shape)

    bmax = _counts(cand)
    for tsub in (t, t // 4, t // 16):
        for tag, kern, feats_map in (
                (f"floor nothing t={tsub}", nothing_kernel,
                 lambda i, *_: (i, 0, 0)),
                (f"floor touch t={tsub}", touch_kernel,
                 lambda i, *_: (i, 0, 0)),
        ):
            call = pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(tsub,),
                    in_specs=[
                        pl.BlockSpec((1, c, f), feats_map),
                        pl.BlockSpec((1, p, G_DIM), lambda i, *_: (i, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, 2 * depth, p),
                                           lambda i, *_: (i, 0, 0)),
                ),
                out_shape=jax.ShapeDtypeStruct((tsub, 2 * depth, p),
                                               jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )
            gsub, psub, bsub = gathered[:tsub], pix[:tsub], bmax[:tsub]
            fj = jax.jit(lambda g_, p_, b_, call=call: call(b_, g_, p_))
            timeit(tag, lambda: fj(gsub, psub, bsub), lambda o: o[:1, 0, 0])


if __name__ == "__main__":
    main()
