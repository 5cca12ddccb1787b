"""On-chip timing of the round-4 keys-only render path, stage by stage:

  binning | keys kernel | winner shade+composite | full fwd | full fwd+bwd
  (vs the round-3 fused-payload path for reference)

plus ``--binstages``: a breakdown of tile_candidates internals (projection,
fan-out+compaction, sort, scatter, global top-K) — the binning stage is the
next bottleneck once the kernel is keys-only.

Usage: python scripts/keysprobe.py [n] [w] [h] [--cand 1536] [--binstages]
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


def _timer(rays):
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
        print(f"{name:20s}: {dt*1e3:8.2f} ms   ({rays/dt/1e6:6.2f} Mrays/s)"
              f"  [first call {time.time()-t0:.0f}s]")
        return out, dt

    return timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=100_000)
    ap.add_argument("w", type=int, nargs="?", default=640)
    ap.add_argument("h", type=int, nargs="?", default=384)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--cand", type=int, default=1536)
    ap.add_argument("--glob", type=int, default=128)
    ap.add_argument("--bands", type=int, default=0)
    ap.add_argument("--binstages", action="store_true")
    ap.add_argument("--shadestages", action="store_true")
    ap.add_argument("--chain", type=int, default=0,
                    help="chain N full renders in-graph for steady-state "
                         "per-frame cost")
    ap.add_argument("--fast", action="store_true",
                    help="only the full fwd / fwd+bwd (and --chain) "
                         "timings — skips per-stage compiles (each stage "
                         "is a separate multi-minute remote compile)")
    ap.add_argument("--fused", action="store_true",
                    help="also time the round-3 fused-payload path")
    args = ap.parse_args()

    from rtgs_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from rtgs_tpu.camera import camera_from_fov
    from rtgs_tpu.ops.peel import peel_keys_pallas
    from rtgs_tpu.render.binning import tile_candidates
    from rtgs_tpu.render.oracle import composite_hits
    from rtgs_tpu.render.tiled import (_tile_pixel_features, pack_features,
                                       precompute_features,
                                       render_tiled_keys,
                                       render_tiled_pallas, shade_winners)
    from rtgs_tpu.scene import random_scene
    from rtgs_tpu.viewer.orbit import orbit_camera_pose

    res = (args.w, args.h)
    rays = args.w * args.h
    kw = dict(tile=(16, 16), max_candidates=args.cand, max_global=args.glob)
    bands = dict(tile_bands=args.bands) if args.bands else {}
    g = random_scene(jax.random.PRNGKey(0), args.n, extent=2.0,
                     scale_range=(0.005, 0.03))
    jax.block_until_ready(g)
    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, res, 60.0)
    timeit = _timer(rays)
    print(f"backend={jax.default_backend()} n={args.n} res={res} "
          f"depth={args.depth} cand={args.cand}")

    # --- stages ---
    if not args.fast:
        binf = jax.jit(lambda g: tile_candidates(g, cam, **kw))
        binning, t_bin = timeit("binning", binf, g,
                                readout=lambda b: b.candidates)
        cand = binning.candidates
        pad_c = (-cand.shape[1]) % 128
        if pad_c:
            cand = jnp.pad(cand, ((0, 0), (0, pad_c)), constant_values=-1)
        packed = jax.jit(
            lambda g: pack_features(precompute_features(g, cam)))(g)
        pix = jax.jit(lambda: _tile_pixel_features(cam, (16, 16)))()
        jax.block_until_ready((packed, pix))

        keysf = jax.jit(
            functools.partial(peel_keys_pallas, depth=args.depth))
        keys, t_keys = timeit("keys kernel", keysf, packed, cand, pix,
                              readout=lambda o: o[0])

        from rtgs_tpu.render.tiled import (composite_layers,
                                           composite_layers_kp,
                                           shade_winners_kp)

        def shade(packed, sid_k, pix):
            a, r, gc, b = shade_winners(packed, sid_k, pix)
            return composite_layers(a, r, gc, b)

        try:
            # The pk layout's 8x K-padding OOMs beyond ~384p — comparison
            # stage only; the production path is kp.
            shadef = jax.jit(shade)
            _, t_shade = timeit("shade+composite pk", shadef, packed,
                                keys[1], pix)
        except Exception as e:
            print(f"shade pk failed: {type(e).__name__} "
                  "(expected at >=720p)")

        def shade_kp(packed, sid_k, pix):
            a, r, gc, b = shade_winners_kp(
                packed, sid_k.transpose(0, 2, 1), pix)
            return composite_layers_kp(a, r, gc, b)

        _, t_shade2 = timeit("shade+composite kp", jax.jit(shade_kp),
                             packed, keys[1], pix)

    fullf = jax.jit(lambda g: render_tiled_keys(
        g, cam, depth=args.depth, **kw, **bands))
    _, t_full = timeit("keys full fwd", fullf, g)

    @jax.jit
    def gradf(g):
        return jax.grad(lambda gg: jnp.sum(render_tiled_keys(
            gg, cam, depth=args.depth, **kw, **bands)))(g)

    _, t_grad = timeit("keys fwd+bwd", gradf, g,
                       readout=lambda gr: gr.means)
    print(f"  => fwd {rays/t_full/1e6:.2f} Mrays/s, "
          f"fwd+bwd {rays/t_grad/1e6:.2f} Mrays/s")

    if args.chain:
        # Steady-state per-frame cost: chain the full render in-graph so
        # dispatch overhead amortizes and DMA pipelines across frames —
        # the number a production serving loop would see.
        it = args.chain

        def fwd_body(x, i):
            img = render_tiled_keys(
                g._replace(means=g.means + 0.0 * x), cam,
                depth=args.depth, **kw, **bands)
            return x + img[0, 0, 0]

        def fb_body(x, i):
            gr = jax.grad(lambda gg: jnp.sum(render_tiled_keys(
                gg, cam, depth=args.depth, **kw, **bands)))(
                g._replace(means=g.means + 0.0 * x))
            return x + gr.means[0, 0]

        for name, body in [("chained fwd", fwd_body),
                           ("chained fwd+bwd", fb_body)]:
            f = jax.jit(lambda x, body=body: jax.lax.fori_loop(
                0, it, lambda i, x: body(x, i), x))
            x0 = jnp.float32(0.0)
            out = f(x0)
            _ = float(out)
            ts = []
            for _i in range(3):
                t0 = time.perf_counter()
                _ = float(f(x0))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            dt = max(ts[1] - 0.027, 1e-9) / it
            print(f"{name:20s}: {dt*1e3:8.2f} ms/frame "
                  f"({rays/dt/1e6:6.2f} Mrays/s) [x{it} chained]")

    if args.fused:
        fusedf = jax.jit(lambda g: render_tiled_pallas(
            g, cam, depth=args.depth, **kw))
        _, t_f = timeit("fused full fwd", fusedf, g)

    if args.shadestages:
        print("--- shade internals (chained x8) ---")
        t, c2 = cand.shape
        p, k = pix.shape[1], args.depth
        slot_k = keys[1]
        it = 8

        def chain(name, body, x0):
            f = jax.jit(lambda x: jax.lax.fori_loop(
                0, it, lambda i, x: body(x, i), x0))
            out = f(x0)
            _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:8])
            ts = []
            for _i in range(5):
                t0 = time.perf_counter()
                out = f(x0)
                _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:8])
                ts.append(time.perf_counter() - t0)
            ts.sort()
            print(f"{name:24s}: {(ts[2]-0.027)/it*1e3:8.2f} ms/iter")

        n_sent = packed.shape[0] - 1
        safe = jnp.where(jnp.isfinite(slot_k), slot_k,
                         jnp.float32(n_sent)).astype(jnp.int32
                                                     ).reshape(t, p * k)
        jax.block_until_ready(safe)

        chain("rows gather (T,PK,64)",
              lambda x, i: packed[(x + i) % (n_sent + 1)].sum(-1)
              .astype(jnp.int32), safe)

        def shade_only(x, i):
            a, _r, _g, _b = shade_winners(packed, slot_k + 0.0 * x, pix)
            return x + a[0, 0, 0]

        chain("full shade_winners", shade_only, jnp.float32(0.0))

        def comp_only(x, i):
            from rtgs_tpu.render.oracle import composite_hits as ch
            a = jnp.abs(keys[0] + x) % 1.0
            r = jnp.stack([a, a, a], -1)
            return x + ch(keys[0], a, r)[0][0, 0, 0]

        chain("composite only", comp_only, jnp.float32(0.0))

    if args.binstages:
        print("--- binning internals ---")
        from rtgs_tpu.render import binning as B

        # 1. projection+classify (everything before the fan-out).
        def proj(g):
            from rtgs_tpu import gaussians as G
            pmin, pmax = G.aabb(g.means, g.quats, g.scales)
            return pmin + pmax

        timeit("aabb+project", jax.jit(proj), g)

        # 2. full fan-out + compaction + sort, separated by stopping at
        # the sort's inputs vs outputs: time tile_candidates with a key
        # sort vs without is not separable post-jit; instead time lax.sort
        # alone at the same size.
        mtx = mty = 8
        n_pairs = min(8 * args.n, args.n * mtx * mty)
        kkey = jax.random.randint(jax.random.PRNGKey(1), (n_pairs,), 0,
                                  1 << 30, dtype=jnp.int32)
        vval = jax.random.randint(jax.random.PRNGKey(2), (n_pairs,), 0,
                                  args.n, dtype=jnp.int32)
        jax.block_until_ready((kkey, vval))
        sortf = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
        timeit(f"lax.sort {n_pairs//1000}k", sortf, kkey, vval)

        csumf = jax.jit(lambda x: jnp.cumsum(x))
        big = jnp.ones((args.n * mtx * mty,), jnp.int32)
        jax.block_until_ready(big)
        timeit(f"cumsum {args.n*mtx*mty//1000}k", csumf, big)


if __name__ == "__main__":
    main()
