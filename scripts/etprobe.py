"""Early-termination headroom diagnostic (CPU, no chip needed).

For a bench-style scene, computes per tile: the chunk count the keys
kernel's bound-based while loop actually sweeps (first chunk c where
max-over-pixels of the K-th nearest t1 <= chunk_lb[c]) vs the full
count-based sweep, plus the hit-density statistics that explain it
(pixels with < K hits pin `worst` at +inf and force a full sweep).

Usage: python scripts/etprobe.py [n] [w] [h] [--cand 1536] [--depth 16]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)

import jax
import jax.numpy as jnp
import numpy as np


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

    from rtgs_tpu.camera import camera_from_fov
    from rtgs_tpu.ops.peel import CHUNK, _gather, _intersect_t1
    from rtgs_tpu.render.binning import tile_candidates
    from rtgs_tpu.render.tiled import (_tile_pixel_features, pack_features,
                                       precompute_features)
    from rtgs_tpu.scene import random_scene
    from rtgs_tpu.viewer.orbit import orbit_camera_pose

    res = (args.w, args.h)
    g = random_scene(jax.random.PRNGKey(0), args.n, extent=2.0,
                     scale_range=(0.005, 0.03))
    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, res, 60.0)

    binning = jax.jit(lambda g: tile_candidates(
        g, cam, tile=(16, 16), max_candidates=args.cand,
        max_global=args.glob, narrow=args.narrow, chunk=CHUNK))(g)
    cand = np.asarray(binning.candidates)
    lb = np.asarray(binning.chunk_lb)
    counts = np.asarray(binning.counts)
    t, ctot = cand.shape
    nchunk = ctot // CHUNK
    packed = jax.jit(lambda g: pack_features(precompute_features(g, cam)))(g)
    pix = jax.jit(lambda: _tile_pixel_features(cam, (16, 16)))()

    k = args.depth

    @jax.jit
    def tile_stats(cand_b, pix_b):
        gathered, _ = _gather(packed, cand_b)
        t1, *_ = _intersect_t1(gathered, pix_b)      # (B, P, C)
        hits = jnp.sum(jnp.isfinite(t1), axis=-1)    # (B, P)
        # K-th nearest per pixel (+inf if < K hits).
        topk = -jax.lax.top_k(-t1, k)[0][..., -1]    # (B, P)
        worst = jnp.max(topk, axis=-1)               # (B,)
        return hits, worst

    B = 60
    hits_all, worst_all = [], []
    for i in range(0, t, B):
        h, w_ = tile_stats(cand[i:i + B], pix[i:i + B])
        hits_all.append(np.asarray(h))
        worst_all.append(np.asarray(w_))
    hits = np.concatenate(hits_all)                  # (T, P)
    worst = np.concatenate(worst_all)                # (T,)

    nc_full = np.ceil(counts / CHUNK).astype(int)
    # First chunk whose suffix bound exceeds worst (sweep stops there).
    stop = np.full(t, 0)
    for c in range(nchunk + 1):
        can_stop = worst > lb[:, min(c, nchunk)]
        stop = np.where((stop == c) & can_stop & (c < nc_full), c + 1, stop)
    nc_et = np.minimum(stop, nc_full)

    print(f"tiles={t} chunks/tile full: mean {nc_full.mean():.2f} "
          f"max {nc_full.max()}  (counts mean {counts.mean():.0f})")
    print(f"chunks/tile with early termination: mean {nc_et.mean():.2f} "
          f"-> sweep work ratio {nc_et.sum()/max(nc_full.sum(),1):.3f}")
    print(f"hits/pixel: mean {hits.mean():.1f} median "
          f"{np.median(hits):.0f} p10 {np.quantile(hits, 0.1):.0f}")
    frac_sparse = (hits < k).mean()
    print(f"pixels with <K hits: {frac_sparse:.1%}")
    tile_sparse = (hits < k).any(axis=1).mean()
    print(f"tiles with any <K-hit pixel (worst=+inf): {tile_sparse:.1%}")
    fin = np.isfinite(worst)
    print(f"tiles with finite worst: {fin.mean():.1%}; of those, "
          f"sweep ratio {nc_et[fin].sum()/max(nc_full[fin].sum(),1):.3f}")


if __name__ == "__main__":
    main()
