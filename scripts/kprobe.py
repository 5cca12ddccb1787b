"""Cost breakdown of the fused peel kernel by ablation (round-2 kernel).

Times pallas kernels of increasing complexity on the same candidate data:

  empty     — DMA the feats block, touch it, write defaults (per-step
              overhead + HBM streaming floor)
  intersect — + the full-candidate quadratic + SH dots (MXU matmuls +
              elementwise over (P, C))
  select    — + the K argmin passes extracting only the winner index
  full      — the production kernel (6-field extraction per pass)

Usage: python scripts/kprobe.py [n] [w] [h] [--variants empty,...]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtgs_tpu.ops import peel
from rtgs_tpu.ops.peel import (CHUNK, G_DIM, _block_pad, _counts, _empty_layers,
                               _gather, _lane_f32, _tile_intersect,
                               _tile_select)


def _kernel(depth, variant, counts_ref, feats_ref, pix_ref, lay_ref):
    bt = feats_ref.shape[0]
    p = pix_ref.shape[1]
    base = pl.program_id(0) * bt
    for i in range(bt):
        cnt = counts_ref[base + i]

        @pl.when(cnt > 0)
        def _tile(i=i):
            if variant == "empty":
                lay_ref[i] = (_empty_layers(p, depth)
                              + feats_ref[i, 0:1, 0:1] * 1e-30)
                return
            t1, q, u, op, r, g, b = _tile_intersect(feats_ref[i], pix_ref[i])
            if variant == "intersect":
                probe = (jnp.min(t1, -1, keepdims=True)
                         + 1e-30 * jnp.sum(q + u + r + g + b, -1,
                                           keepdims=True))
                lay_ref[i] = _empty_layers(p, depth) + probe * 1e-30
                return
            if variant == "select":
                c = t1.shape[-1]
                lanef = _lane_f32(t1.shape)
                t1m = t1
                cols = []
                for _k in range(depth):
                    m = jnp.min(t1m, axis=-1, keepdims=True)
                    fin = m < jnp.inf
                    sel = (t1m == m) & fin
                    fidx = jnp.min(jnp.where(sel, lanef, float(c)), axis=-1,
                                   keepdims=True)
                    first = (lanef == fidx) & fin
                    cols.append(jnp.where(fin, fidx, -1.0))
                    t1m = jnp.where(first, jnp.inf, t1m)
                probe = sum(cols) * 1e-30 + 1e-30 * jnp.sum(
                    q + u + r + g + b, -1, keepdims=True)
                lay_ref[i] = _empty_layers(p, depth) + probe
                return
            lay_ref[i] = _tile_select(depth, t1, q, u, op, r, g, b)

        @pl.when(cnt == 0)
        def _blank(i=i):
            lay_ref[i] = _empty_layers(p, depth)


def run_variant(variant, gathered, counts, pix, depth):
    t, c, f = gathered.shape
    p = pix.shape[1]
    counts2, bt, nb, (g2, pix2) = _block_pad(counts, gathered, pix)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, c, f), lambda i, cr: (i, 0, 0)),
            pl.BlockSpec((bt, p, G_DIM), lambda i, cr: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, p, 8 * depth), lambda i, cr: (i, 0, 0)),
    )
    fn = pl.pallas_call(
        functools.partial(_kernel, depth, variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bt, p, 8 * depth), jnp.float32),
        interpret=peel._interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return jax.jit(lambda: fn(counts2, g2, pix2))


def readback_floor(x):
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        _ = np.asarray(x[:1, :1, :8])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[3]


def sync_time(fn, floor, iters=5):
    """Single-call timing with a forced tiny readback (block_until_ready
    does not reliably block on the tunneled backend); subtract the ~25ms
    readback floor. Honest for T >~ 50ms."""
    _ = np.asarray(fn()[:1, :1, :8])     # warm/compile
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn()[:1, :1, :8])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return max(ts[len(ts) // 2] - floor, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=100_000)
    ap.add_argument("w", type=int, nargs="?", default=640)
    ap.add_argument("h", type=int, nargs="?", default=384)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--cand", type=int, default=512)
    ap.add_argument("--glob", type=int, default=128)
    ap.add_argument("--variants", type=str,
                    default="empty,intersect,select,full")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from rtgs_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from rtgs_tpu.camera import camera_from_fov
    from rtgs_tpu.render.binning import tile_candidates
    from rtgs_tpu.render.tiled import (_tile_pixel_features, pack_features,
                                       precompute_features)
    from rtgs_tpu.scene import random_scene
    from rtgs_tpu.viewer.orbit import orbit_camera_pose

    res = (args.w, args.h)
    rays = args.w * args.h
    g = random_scene(jax.random.PRNGKey(0), args.n, extent=2.0,
                     scale_range=(0.005, 0.03))
    jax.block_until_ready(g)
    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, res, 60.0)
    binning = jax.jit(lambda g: tile_candidates(
        g, cam, tile=(16, 16), max_candidates=args.cand,
        max_global=args.glob))(g)
    cand = binning.candidates
    pad_c = (-cand.shape[1]) % 128
    if pad_c:
        cand = jnp.pad(cand, ((0, 0), (0, pad_c)), constant_values=-1)
    packed = jax.jit(lambda g: pack_features(
        precompute_features(g, cam)))(g)
    pix = jax.jit(lambda: _tile_pixel_features(cam, (16, 16)))()
    gathered, _ = _gather(packed, cand)
    gathered = jax.block_until_ready(gathered)
    counts = _counts(cand)
    print(f"# device={jax.devices()[0]} tiles={cand.shape[0]} "
          f"cand={cand.shape[1]} mean_count={float(jnp.mean(counts)):.0f} "
          f"tb={os.environ.get('RTGS_TILE_BLOCK', '4')}")

    floor = readback_floor(gathered)
    print(f"# readback floor {floor*1e3:.1f} ms")
    prev = 0.0
    for variant in args.variants.split(","):
        t0 = time.time()
        fn = run_variant(variant, gathered, counts, pix, args.depth)
        t = sync_time(fn, floor, args.iters)  # floor-corrected
        print(f"{variant:9s}: {t*1e3:8.2f} ms  (+{(t-prev)*1e3:7.2f} ms)  "
              f"{rays/t/1e6:7.2f} Mrays/s   [compile {time.time()-t0:.0f}s]")
        prev = t


if __name__ == "__main__":
    main()
