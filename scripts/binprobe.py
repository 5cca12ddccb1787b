"""Primitive-level timing of the binning pipeline on the chip.

Single-call timings under ~28 ms measure only the tunnel's RPC floor
(memory: axon-tunnel-pitfalls), so every primitive here runs CHAINED
``--iters`` times inside one jitted fori_loop with data-dependent carry,
and the per-iteration cost is (total − floor)/iters.

Usage: python scripts/binprobe.py [n] [w] [h] [--iters 16]
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
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--cand", type=int, default=1536)
    args = ap.parse_args()

    from rtgs_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from rtgs_tpu.camera import camera_from_fov
    from rtgs_tpu.render.binning import tile_candidates
    from rtgs_tpu.scene import random_scene
    from rtgs_tpu.viewer.orbit import orbit_camera_pose

    n = args.n
    res = (args.w, args.h)
    g = random_scene(jax.random.PRNGKey(0), n, extent=2.0,
                     scale_range=(0.005, 0.03))
    jax.block_until_ready(g)
    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, res, 60.0)
    it = args.iters

    def floor_of(x):
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            _ = np.asarray(x.reshape(-1)[:8])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[3]

    def chain(name, body, x0):
        """body: x -> x (same shape/dtype); timed over `it` chained runs."""
        f = jax.jit(lambda x: jax.lax.fori_loop(
            0, it, lambda i, x: body(x, i), x0))
        out = f(x0)
        _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:8])
        fl = floor_of(jax.tree.leaves(out)[0])
        ts = []
        for _i in range(5):
            t0 = time.perf_counter()
            out = f(x0)
            _ = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:8])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        dt = max(ts[2] - fl, 1e-9) / it
        print(f"{name:28s}: {dt*1e3:8.3f} ms/iter")
        return dt

    key = jax.random.PRNGKey(1)
    pairs = 8 * n
    kkey = jax.random.randint(key, (pairs,), 0, 1 << 30, jnp.int32)
    vval = jax.random.randint(key, (pairs,), 0, n, jnp.int32)
    jax.block_until_ready((kkey, vval))

    # 1. The pair sort (key, val).
    def sort_body(x, i):
        k, v = x
        k2, v2 = jax.lax.sort((k ^ i, v), num_keys=1)
        return (k2, v2)

    chain(f"lax.sort {pairs//1000}k pairs", sort_body, (kkey, vval))

    # 1b. Sort at half size.
    chain(f"lax.sort {pairs//2000}k pairs", sort_body,
          (kkey[:pairs // 2], vval[:pairs // 2]))

    # 2. cumsum over the narrow fan-out (N*9 bools).
    fanout = jnp.ones((n * 9,), jnp.int32)
    chain(f"cumsum {n*9//1000}k", lambda x, i: jnp.cumsum(x + i) % 7, fanout)

    # 3. max-scan (segment start) over the sorted pairs.
    chain(f"max-scan {pairs//1000}k",
          lambda x, i: jax.lax.associative_scan(jnp.maximum, x + i), kkey)

    # 4. scatter 800k -> 800k.
    def scat_body(x, i):
        dst = (x + i) % pairs
        return jnp.full((pairs,), 0, jnp.int32).at[dst].set(x, mode="drop")

    chain(f"scatter {pairs//1000}k", scat_body, vval)

    # 5. top_k over N (global list).
    def topk_body(x, i):
        v, _ = jax.lax.top_k(x + i.astype(jnp.float32), 128)
        return x.at[:128].set(v)

    chain(f"top_k(N={n//1000}k, 128)", topk_body,
          jax.random.uniform(key, (n,)))

    # 6. the projection/classify stage: full tile_candidates minus the
    # pair machinery is hard to isolate; time the whole builder chained
    # by perturbing means.
    def full_body(x, i):
        b = tile_candidates(
            jax.tree.map(lambda a: a, g)._replace(
                means=g.means + 0.0 * x[0, 0]),
            cam, tile=(16, 16), max_candidates=args.cand, max_global=128)
        return x + b.candidates[0, 0].astype(jnp.float32)

    chain("tile_candidates (full)", full_body,
          jnp.zeros((8, 8), jnp.float32))


if __name__ == "__main__":
    main()
