"""Stage decomposition of the KEYS render path on chip (round 5):

  binning      tile_candidates (fast path: searchsorted + row slices)
  binning+map  same with the GradPlan inverse-permutation map
  featpack     precompute_features + pack_features
  kernel       peel_keys (Pallas, early termination) given binning
  shade        shade_winners_kp + composite given winner sids
  full fwd     render_tiled_keys end to end
  full step    jax.grad of sum(render)

Usage: python scripts/keystage.py [n] [w] [h] [--cand 1536]
       [--bands 0] [--narrow 3]
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
    """Per-sync tunnel overhead: executing ANY program and reading its
    result back costs ~30 ms on the axon backend regardless of content
    (scripts/lpprobe.py nullprobe, round 5) — and re-reading a CACHED
    array costs ~0, so the old precomputed-probe floor subtracted
    nothing. Time a fresh null program per iteration instead; bench.py's
    floor (which re-executes) was already correct."""
    import jax.numpy as jnp
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
    print(f"{label:12s} {dt*1e3:8.1f} ms   (min {lo*1e3:.1f})")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=100_000)
    ap.add_argument("w", type=int, nargs="?", default=640)
    ap.add_argument("h", type=int, nargs="?", default=384)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--cand", type=int, default=1536)
    ap.add_argument("--glob", type=int, default=128)
    ap.add_argument("--bands", type=int, default=0)
    ap.add_argument("--narrow", type=int, default=3)
    args = ap.parse_args()

    from rtgs_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from rtgs_tpu.camera import camera_from_fov
    from rtgs_tpu.ops.peel import CHUNK, peel_keys
    from rtgs_tpu.render.binning import tile_candidates
    from rtgs_tpu.render.tiled import (_tile_pixel_features,
                                       composite_layers_kp, pack_features,
                                       precompute_features,
                                       render_tiled_keys, shade_winners_kp)
    from rtgs_tpu.scene import random_scene
    from rtgs_tpu.viewer.orbit import orbit_camera_pose

    key = jax.random.PRNGKey(0)
    g = random_scene(key, args.n, extent=2.0, scale_range=(0.005, 0.03))
    jax.block_until_ready(g)
    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, (args.w, args.h), 60.0)
    kw = dict(depth=args.depth, tile=(16, 16), max_candidates=args.cand,
              max_global=args.glob, bin_narrow=args.narrow)
    if args.bands > 1:
        kw["tile_bands"] = args.bands
    bkw = dict(tile=(16, 16), max_candidates=args.cand,
               max_global=args.glob, narrow=args.narrow, chunk=CHUNK)

    b0 = jax.jit(lambda gg: tile_candidates(gg, cam, **bkw))
    timeit("binning", lambda: b0(g), lambda o: o.candidates[:1, 0])
    b1 = jax.jit(lambda gg: tile_candidates(gg, cam, grad_map=True, **bkw))
    timeit("binning+map", lambda: b1(g),
           lambda o: o.grad_plan.gather_idx[:1, 0])

    fp = jax.jit(lambda gg: pack_features(precompute_features(gg, cam)))
    timeit("featpack", lambda: fp(g), lambda o: o[:1, 0])

    binning = b0(g)
    cand = binning.candidates
    lb = binning.chunk_lb
    pix = _tile_pixel_features(cam, (16, 16))
    packed = fp(g)
    jax.block_until_ready((cand, lb, pix, packed))

    if args.bands > 1:
        # Isolated kernel/shade at one band's scale (the monolithic
        # (T, C, F) gather is the thing banding exists to avoid — 7.75 GB
        # at 1M); scale the printed numbers by the band count mentally.
        nb = -(-cand.shape[0] // args.bands)
        cand, lb, pix = cand[:nb], lb[:nb], pix[:nb]
        print(f"(isolated kernel/shade limited to first {nb} tiles "
              f"= 1/{args.bands} of the frame)")
    # Pass the big arrays as ARGUMENTS, not closure constants: baked-in
    # constants ride inside the remote-compile request body, which the
    # tunnel caps (HTTP 413 at the 1M shapes).
    kern = jax.jit(lambda p, cand_, pix_, lb_: peel_keys(
        p, cand_, pix_, args.depth, chunk_lb=lb_))
    timeit("kernel", lambda: kern(packed, cand, pix, lb),
           lambda o: o[0][:1, 0, 0])

    _t1k, sid_k = kern(packed, cand, pix, lb)
    sid_kp = jax.lax.stop_gradient(sid_k.transpose(0, 2, 1))
    jax.block_until_ready(sid_kp)
    sh = jax.jit(lambda p, s_, pix_: composite_layers_kp(*shade_winners_kp(
        p, s_, pix_)))
    timeit("shade+comp", lambda: sh(packed, sid_kp, pix),
           lambda o: o[:1, 0])

    fwd = jax.jit(lambda gg: render_tiled_keys(gg, cam, **kw))
    timeit("full fwd", lambda: fwd(g), lambda o: o[:1, 0])

    grad = jax.jit(jax.grad(lambda gg: jnp.sum(
        render_tiled_keys(gg, cam, **kw))))
    timeit("full step", lambda: grad(g), lambda o: o.means[:1, 0])


if __name__ == "__main__":
    main()
