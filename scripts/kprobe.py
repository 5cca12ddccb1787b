"""Cost breakdown of the fused peel kernel by ablation (chunked kernel).

Times pallas kernels of increasing complexity on the same candidate data,
all with the production kernel's grid (1-D over tile blocks), block specs,
scalar-prefetched counts and internal chunk loop:

  empty     — chunk loop only: DMA the feats block, slice each chunk,
              touch it, write defaults (per-step overhead + HBM floor)
  intersect — + the per-chunk quadratic (two small matmuls + elementwise)
  shade     — + the exp/SH shading of every chunk (no merge)
  full      — the production kernel (shading + top-K merge under the
              saturation predicate)

Usage: python scripts/kprobe.py [n] [w] [h] [--cand 512] [--variants ...]
Env: RTGS_TILE_BLOCK to sweep the tile-block size.
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
from rtgs_tpu.ops.peel import (CHUNK, G_DIM, _counts, _gather, _lane,
                               _intersect_t1, _merge_topk, _shade_q,
                               _tile_block)


def _kernel(depth, variant, bmax_ref, feats_ref, pix_ref, out_ref):
    from rtgs_tpu.ops.peel import (_chunk_update, _init_state, _composite,
                                   _merge_topk, _shade_q)

    i = pl.program_id(0)
    pix = pix_ref[...]
    bt, p = pix.shape[0], pix.shape[1]
    nc = pl.cdiv(bmax_ref[i], CHUNK)

    if variant == "prod":
        st = jax.lax.fori_loop(
            0, nc, lambda c, st: _chunk_update(depth, c, pix, feats_ref, st),
            _init_state(bt, p, depth))
        rr, rg, rb, tr = _composite(depth, st[0], st[2], st[3], st[4], st[5])
        out_ref[:, 0, :] = rr[..., 0]
        out_ref[:, 1, :] = rg[..., 0]
        out_ref[:, 2, :] = rb[..., 0]
        out_ref[:, 3, :] = tr[..., 0]
        return

    if variant == "prod_static":
        cmax = feats_ref.shape[1] // CHUNK
        st = jax.lax.fori_loop(
            0, cmax, lambda c, st: _chunk_update(depth, c, pix, feats_ref, st),
            _init_state(bt, p, depth))
        rr, rg, rb, tr = _composite(depth, st[0], st[2], st[3], st[4], st[5])
        out_ref[:, 0, :] = rr[..., 0]
        out_ref[:, 1, :] = rg[..., 0]
        out_ref[:, 2, :] = rb[..., 0]
        out_ref[:, 3, :] = tr[..., 0]
        return

    def chunk_partial(c, st):
        off = pl.multiple_of(c * CHUNK, CHUNK)
        feats = feats_ref[:, pl.ds(off, CHUNK), :]
        t1, a, b, cq, delta = _intersect_t1(feats, pix)
        if variant == "intersect":
            return (jnp.minimum(st[0], jnp.min(t1, -1, keepdims=True)),
                    ) + st[1:]
        if variant == "merge_t1":
            # merge with dummy payloads (no shade): isolates the merge.
            nt1, nqa, nr, ng, nb, nord = _merge_topk(
                depth, (st[0], st[2], st[3], st[4], st[5], st[1]),
                (t1, t1, t1, t1, t1,
                 (_lane(t1.shape) + c * CHUNK).astype(jnp.float32)))
            return (nt1, nord, nqa, nr, ng, nb)
        if variant == "shade_nomerge":
            qa, r, g, bl = _shade_q(feats, pix, t1, a, b, cq, delta)
            return (jnp.minimum(st[0], jnp.min(t1, -1, keepdims=True)),
                    st[1],
                    jnp.minimum(st[2], jnp.min(qa + r + g + bl, -1,
                                               keepdims=True)),
                    ) + st[3:]
        if variant == "shade_qa":
            # qa elementwise + log only, no SH dots.
            op = feats[..., 10]
            qa = jnp.where(
                (delta > 0.0) & jnp.isfinite(t1),
                b * b / (4.0 * a) - (cq + 3.0) + jnp.log(op)[:, None, :],
                -jnp.inf)
            return (jnp.minimum(st[0], jnp.min(t1, -1, keepdims=True)),
                    st[1],
                    jnp.minimum(st[2], jnp.min(qa, -1, keepdims=True)),
                    ) + st[3:]
        if variant == "shade_dots":
            # the 3 SH dot_generals only.
            y = pix[..., 9:24]
            ct = (((2,), (2,)), ((0,), (0,)))
            acc = st[2]
            for ch in range(3):
                sh_ch = feats[..., 14 + 15 * ch: 29 + 15 * ch]
                r = jax.lax.dot_general(y, sh_ch, ct,
                                        preferred_element_type=jnp.float32)
                acc = jnp.minimum(acc, jnp.min(r, -1, keepdims=True))
            return (jnp.minimum(st[0], jnp.min(t1, -1, keepdims=True)),
                    st[1], acc) + st[3:]
        return st

    if variant == "empty":
        out_ref[:, 0, :] = pix[..., 0] + feats_ref[0, 0:1, 0:1] * 1e-30
        out_ref[:, 1, :] = pix[..., 1]
        out_ref[:, 2, :] = pix[..., 2]
        out_ref[:, 3, :] = pix[..., 3]
        return
    st = jax.lax.fori_loop(0, nc, chunk_partial, _init_state(bt, p, depth))
    out_ref[:, 0, :] = st[0][..., 0]
    out_ref[:, 1, :] = st[2][..., 0]
    out_ref[:, 2, :] = st[3][..., 0]
    out_ref[:, 3, :] = st[4][..., 0]


def run_variant(variant, gathered, counts, pix, depth):
    t, c, f = gathered.shape
    p = pix.shape[1]
    bt = max(1, min(_tile_block(), t))
    nb = -(-t // bt)
    pad = nb * bt - t
    if pad:
        counts = jnp.pad(counts, (0, pad))
        gathered = jnp.pad(gathered, ((0, pad), (0, 0), (0, 0)))
        pix = jnp.pad(pix, ((0, pad), (0, 0), (0, 0)))
    bmax = jnp.max(counts.reshape(nb, bt), axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, c, f), lambda i, cr: (i, 0, 0)),
            pl.BlockSpec((bt, p, G_DIM), lambda i, cr: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, 4, p), lambda i, cr: (i, 0, 0)),
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
    # The arrays MUST be jit *arguments*: a zero-arg lambda closes over
    # them as HLO constants, and the tunneled remote compiler rejects the
    # resulting multi-hundred-MB request with HTTP 413.
    jitted = jax.jit(fn)
    return functools.partial(jitted, bmax, gathered, pix)


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
                    default="empty,intersect,merge_t1,shade_nomerge,prod,prod_static")
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
          f"tb={_tile_block()}")

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
