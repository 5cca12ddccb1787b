"""Stage-level timing of the production render pipeline on the chip:
binning | feature pack | gather | kernel | full render. Identifies where
the bench-vs-kprobe gap lives (XLA-side vs Pallas-side).

Usage: python scripts/stageprobe.py [n] [w] [h] [--cand 1536]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=100_000)
    ap.add_argument("w", type=int, nargs="?", default=640)
    ap.add_argument("h", type=int, nargs="?", default=384)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--cand", type=int, default=1536)
    ap.add_argument("--glob", type=int, default=128)
    args = ap.parse_args()

    from rtgs_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from rtgs_tpu.camera import camera_from_fov
    from rtgs_tpu.ops.peel import peel_pallas, _counts
    from rtgs_tpu.render.binning import tile_candidates
    from rtgs_tpu.render.tiled import (_tile_pixel_features, pack_features,
                                       precompute_features,
                                       render_tiled_pallas)
    from rtgs_tpu.scene import random_scene
    from rtgs_tpu.viewer.orbit import orbit_camera_pose

    res = (args.w, args.h)
    rays = args.w * args.h
    kw = dict(tile=(16, 16), max_candidates=args.cand, max_global=args.glob)
    g = random_scene(jax.random.PRNGKey(0), args.n, extent=2.0,
                     scale_range=(0.005, 0.03))
    jax.block_until_ready(g)
    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, res, 60.0)

    def floor_of(x):
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            _ = np.asarray(x.reshape(-1)[:8])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[3]

    def timeit(name, fn, *a, readout=None, iters=5):
        t0 = time.time()
        out = fn(*a)
        leaf = readout(out) if readout else jax.tree.leaves(out)[0]
        _ = np.asarray(leaf.reshape(-1)[:8])
        fl = floor_of(leaf)
        ts = []
        for _i in range(iters):
            t0b = time.perf_counter()
            out = fn(*a)
            leaf = readout(out) if readout else jax.tree.leaves(out)[0]
            _ = np.asarray(leaf.reshape(-1)[:8])
            ts.append(time.perf_counter() - t0b)
        ts.sort()
        dt = max(ts[len(ts) // 2] - fl, 1e-9)
        print(f"{name:16s}: {dt*1e3:8.2f} ms   ({rays/dt/1e6:6.2f} Mrays/s)"
              f"  [first call {time.time()-t0:.0f}s]")
        return out, dt

    # Stage 1: binning.
    binf = jax.jit(lambda g: tile_candidates(g, cam, **kw))
    binning, t_bin = timeit("binning", binf, g,
                            readout=lambda b: b.candidates)

    # Stage 2: features + pix (camera-folded packing).
    packf = jax.jit(lambda g: pack_features(precompute_features(g, cam)))
    packed, t_pack = timeit("pack_features", packf, g)
    pixf = jax.jit(lambda: _tile_pixel_features(cam, (16, 16)))
    pix, t_pix = timeit("pix_features", pixf)

    # Stage 3: the (T, C, F) gather.
    cand = binning.candidates
    pad_c = (-cand.shape[1]) % 128
    if pad_c:
        cand = jnp.pad(cand, ((0, 0), (0, pad_c)), constant_values=-1)
    n_sent = packed.shape[0] - 1
    gatherf = jax.jit(
        lambda p, c: p[jnp.where(c >= 0, c, n_sent)])
    gathered, t_gather = timeit("gather(T,C,F)", gatherf, packed, cand)
    print(f"  gathered {gathered.nbytes/1e6:.0f} MB "
          f"-> {gathered.nbytes/t_gather/1e9:.0f} GB/s")

    # Stage 4: the fused kernel alone (inputs pre-materialized).
    kernf = jax.jit(functools.partial(peel_pallas, depth=args.depth))
    _, t_kern = timeit(
        "peel kernel", lambda p, c, x: kernf(p, c, x)[0], packed, cand, pix)

    # Stage 5: full production render (one program).
    rendf = jax.jit(lambda g: render_tiled_pallas(
        g, cam, depth=args.depth, **kw))
    _, t_full = timeit("full render", rendf, g)

    resid = t_full - (t_bin + t_pack + t_pix + t_kern)
    print(f"sum(stages 1,2,pix,kernel) = "
          f"{(t_bin+t_pack+t_pix+t_kern)*1e3:.1f} ms; "
          f"full - sum = {resid*1e3:+.1f} ms "
          f"(gather is inside the kernel stage here: the jitted kernel "
          f"call re-gathers internally)")


if __name__ == "__main__":
    main()
