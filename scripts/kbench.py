"""Stage-breakdown microbenchmark for the tiled/Pallas render pipeline.

Times, separately and on the real device:
  * binning  — tile_candidates
  * gather   — feature pack + candidate gather
  * kernel   — the fused Pallas peel (fwd) on pre-built inputs
  * kernel bwd — hand-written backward on pre-built inputs
  * e2e fwd  — render_tiled_pallas
  * e2e grad — jax.grad of sum(render_tiled_pallas)

Usage: python scripts/kbench.py [n] [w] [h] [--stages binning,gather,kernel,...]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

print = functools.partial(print, flush=True)


def log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr)

import jax
import jax.numpy as jnp
import numpy as np


def sync_time(fn, iters=5, warm=1):
    for _ in range(warm):
        jax.block_until_ready(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=250_000)
    ap.add_argument("w", type=int, nargs="?", default=1280)
    ap.add_argument("h", type=int, nargs="?", default=720)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--cand", type=int, default=512)
    ap.add_argument("--glob", type=int, default=128)
    ap.add_argument("--stages", type=str,
                    default="binning,gather,kernel,kbwd,e2e,grad")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    from rtgs_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()

    from rtgs_tpu.camera import camera_from_fov
    from rtgs_tpu.render.binning import tile_candidates
    from rtgs_tpu.render.tiled import (
        render_tiled_pallas, precompute_features, pack_features,
        _tile_pixel_features)
    from rtgs_tpu.ops import peel
    from rtgs_tpu.scene import random_scene
    from rtgs_tpu.viewer.orbit import orbit_camera_pose

    n, res, depth = args.n, (args.w, args.h), args.depth
    tile = (args.tile, args.tile)
    kw = dict(tile=tile, max_candidates=args.cand, max_global=args.glob)
    rays = res[0] * res[1]

    log("resolving device")
    print(f"# device={jax.devices()[0]} n={n} res={res} depth={depth} "
          f"tile={tile} cand={args.cand}+{args.glob}")
    key = jax.random.PRNGKey(0)
    g = random_scene(key, n, extent=2.0, scale_range=(0.005, 0.03))
    jax.block_until_ready(g)
    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, res, 60.0)

    log("scene built; compiling binning")
    binf = jax.jit(lambda g: tile_candidates(g, cam, **kw))
    if "binning" in stages:
        t = sync_time(lambda: binf(g), args.iters)
        b = binf(g)
        live = int(jnp.sum(b.candidates >= 0))
        print(f"binning: {t*1e3:8.2f} ms   cand_shape={b.candidates.shape} "
              f"live={live} ({live/b.candidates.size:.1%}) "
              f"local_ovf={int(b.local_overflow)} "
              f"global_ovf={int(b.global_overflow)}")

    log("binning ready; building candidates")
    binning = jax.block_until_ready(binf(g))
    cand = binning.candidates
    pad_c = (-cand.shape[1]) % 128
    if pad_c:
        cand = jnp.pad(cand, ((0, 0), (0, pad_c)), constant_values=-1)

    def gather_pack(g):
        packed = pack_features(precompute_features(g, cam))
        gathered, _ = peel._gather(packed, cand)
        return gathered

    if "gather" in stages:
        gatherf = jax.jit(gather_pack)
        t = sync_time(lambda: gatherf(g), args.iters)
        gx = gatherf(g)
        print(f"gather : {t*1e3:8.2f} ms   gathered={gx.shape} "
              f"{gx.size*4/1e9:.2f} GB")

    packed = jax.block_until_ready(jax.jit(
        lambda g: pack_features(precompute_features(g, cam)))(g))
    pix = jax.block_until_ready(jax.jit(
        lambda: _tile_pixel_features(cam, tile))())

    if "kernel" in stages:
        log("compiling fwd kernel")
        kf = jax.jit(lambda p: peel.peel_pallas(p, cand, pix, depth))
        t = sync_time(lambda: kf(packed), args.iters)
        print(f"kernel : {t*1e3:8.2f} ms   {rays/t/1e6:7.2f} Mrays/s "
              f"(fwd, kernel+gather only)")

    if "kbwd" in stages:
        log("compiling bwd kernel")
        def loss(p):
            rad, trans = peel.peel_pallas(p, cand, pix, depth)
            return jnp.sum(rad) + jnp.sum(trans)
        kg = jax.jit(jax.grad(loss))
        t = sync_time(lambda: kg(packed), args.iters)
        print(f"kbwd   : {t*1e3:8.2f} ms   {rays/t/1e6:7.2f} Mrays/s "
              f"(fwd+bwd, kernel+gather only)")

    if "e2e" in stages:
        ef = jax.jit(lambda g: render_tiled_pallas(g, cam, depth=depth, **kw))
        t = sync_time(lambda: ef(g), args.iters)
        print(f"e2e fwd: {t*1e3:8.2f} ms   {rays/t/1e6:7.2f} Mrays/s")

    if "grad" in stages:
        def eloss(g):
            return jnp.sum(render_tiled_pallas(g, cam, depth=depth, **kw))
        egf = jax.jit(jax.grad(eloss))
        t = sync_time(lambda: egf(g), args.iters)
        print(f"e2e f+b: {t*1e3:8.2f} ms   {rays/t/1e6:7.2f} Mrays/s")


if __name__ == "__main__":
    main()
