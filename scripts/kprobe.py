"""Cost breakdown of the fused peel kernel by ablation.

Times pallas kernels of increasing complexity on the same candidate data:

  empty     — DMA the feats block, touch it, write out (per-step overhead
              + HBM streaming floor)
  intersect — + the per-chunk quadratic (two small matmuls) for all chunks
  shade     — + exp/SH shading every chunk (no top-K merge)
  merge     — + the top-K merge every chunk (no skip predicate)
  full      — the production kernel (merge under the any(t1<kth) predicate)

Usage: python scripts/kprobe.py [n] [w] [h] [--variants empty,intersect,...]
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
from rtgs_tpu.ops.peel import (CHUNK, G_DIM, _block_pad, _composite, _counts,
                               _gather, _intersect_t1, _lane, _merge_topk,
                               _shade)


def _kernel(depth, variant, bmax_ref, feats_ref, pix_ref, out_ref,
            s_t1, s_alpha, s_r, s_g, s_b):
    i = pl.program_id(0)
    pix = pix_ref[...]
    s_t1[...] = jnp.full_like(s_t1, jnp.inf)
    s_alpha[...] = jnp.zeros_like(s_alpha)
    s_r[...] = jnp.zeros_like(s_r)
    s_g[...] = jnp.zeros_like(s_g)
    s_b[...] = jnp.zeros_like(s_b)

    def body(c, carry):
        off = pl.multiple_of(c * CHUNK, CHUNK)
        feats = feats_ref[:, pl.ds(off, CHUNK), :]
        if variant == "empty":
            s_alpha[...] += feats[:, 0:1, 0:16] * 1e-30
            return carry
        t1, a, b, cq, delta = _intersect_t1(feats, pix)
        if variant == "intersect":
            s_t1[...] = jnp.minimum(
                s_t1[...], jnp.min(t1, axis=-1, keepdims=True))
            return carry
        if variant == "shade":
            alpha, r, g, bl, _ = _shade(feats, pix, t1, a, b, cq, delta)
            s_alpha[...] += jnp.sum(alpha, -1, keepdims=True) * 1e-30
            s_r[...] += jnp.sum(r, -1, keepdims=True) * 1e-30
            return carry
        if variant == "shade_exp":
            rho = jnp.where(delta > 0.0,
                            jnp.exp(b * b / (4.0 * a) - (cq + 3.0)), 0.0)
            alpha = jnp.where(jnp.isfinite(t1),
                              feats[..., 10][:, None, :] * rho, 0.0)
            s_alpha[...] += jnp.sum(alpha, -1, keepdims=True) * 1e-30
            return carry
        if variant == "shade_dots":
            y = pix[..., 9:24]
            contract = (((2,), (2,)), ((0,), (0,)))
            acc = jnp.zeros_like(t1)
            for ch in range(3):
                sh_ch = feats[..., 14 + 15 * ch: 29 + 15 * ch]
                acc = acc + jax.lax.dot_general(
                    y, sh_ch, contract, preferred_element_type=jnp.float32)
            s_r[...] += jnp.sum(acc, -1, keepdims=True) * 1e-30
            return carry
        if variant == "shade_dots2d":
            y = pix[0, :, 9:24]
            contract = (((1,), (1,)), ((), ()))
            acc = jnp.zeros_like(t1[0])
            for ch in range(3):
                sh_ch = feats[0, :, 14 + 15 * ch: 29 + 15 * ch]
                acc = acc + jax.lax.dot_general(
                    y, sh_ch, contract, preferred_element_type=jnp.float32)
            s_r[...] += jnp.sum(acc, -1, keepdims=True)[None] * 1e-30
            return carry

        kth = s_t1[..., depth - 1:depth]

        def do_merge():
            alpha, r, g, bl, _ = _shade(feats, pix, t1, a, b, cq, delta)
            nt1, nalpha, nr, ng, nb = _merge_topk(
                depth,
                (s_t1[...], s_alpha[...], s_r[...], s_g[...], s_b[...]),
                (t1, alpha, r, g, bl))
            s_t1[...], s_alpha[...] = nt1, nalpha
            s_r[...], s_g[...], s_b[...] = nr, ng, nb

        if variant == "merge":
            do_merge()
        else:  # full
            pl.when(jnp.any(t1 < kth))(do_merge)
        return carry

    jax.lax.fori_loop(0, pl.cdiv(bmax_ref[i], CHUNK), body, 0)
    rr, rg, rb, tr = _composite(
        depth, s_alpha[...], s_r[...], s_g[...], s_b[...])
    out_ref[:, 0, :] = rr[..., 0]
    out_ref[:, 1, :] = rg[..., 0]
    out_ref[:, 2, :] = rb[..., 0]
    out_ref[:, 3, :] = tr[..., 0]


def run_variant(variant, gathered, counts, pix, depth):
    t, c, f = gathered.shape
    p = pix.shape[1]
    g2, bmax, pix2, bt, nb, _ = _block_pad(gathered, counts, pix)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, c, f), lambda i, bm: (i, 0, 0)),
            pl.BlockSpec((bt, p, G_DIM), lambda i, bm: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, 4, p), lambda i, bm: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((bt, p, depth), jnp.float32)
                        for _ in range(5)],
    )
    fn = pl.pallas_call(
        functools.partial(_kernel, depth, variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bt, 4, p), jnp.float32),
        interpret=peel._interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    # NOTE: do NOT wrap the pallas_call in a lax.scan to batch timing —
    # measured catastrophic (~20x) slowdowns for pallas inside while
    # bodies. Single calls with a forced readback are the honest timing.
    return jax.jit(lambda: fn(bmax, g2, pix2)), None


def readback_floor(x):
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        _ = np.asarray(x[:1, :1, :8])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[3]


def sync_time(fn, _arg, floor, iters=5):
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
                    default="empty,intersect,shade,merge,full")
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
          f"tb={os.environ.get('RTGS_TILE_BLOCK', '1')}")

    floor = readback_floor(gathered)
    print(f"# readback floor {floor*1e3:.1f} ms; chained x{args.iters}")
    prev = 0.0
    for variant in args.variants.split(","):
        t0 = time.time()
        chain, arg = run_variant(variant, gathered, counts, pix, args.depth)
        t = sync_time(chain, arg, floor, args.iters)  # floor-corrected
        print(f"{variant:9s}: {t*1e3:8.2f} ms  (+{(t-prev)*1e3:7.2f} ms)  "
              f"{rays/t/1e6:7.2f} Mrays/s   [compile {time.time()-t0:.0f}s]")
        prev = t


if __name__ == "__main__":
    main()
