"""Hypothesis-level timing for the binning + backward hot spots (chip).

Chained in-graph (memory: axon-tunnel-pitfalls — single calls measure the
RPC floor). Times, with realistic shapes for a given config:

  gather TxC        — candidate-matrix gather val_s[idx] (the suspected
                      binning dominator: 1.6M scalar int32 gathers)
  gather TxC x2     — the same plus the round-5 chunk_lb key gather
  fanout (N,9)      — minor-dim-9 fan-out construction (lane-pad test)
  fanout (9,N)      — the lane-friendly transpose of the same
  scatter-add tc    — tile-count scatter-add (pairs -> T+2)
  rows-cot scatter  — backward scatter-add of (T*P*K, 64) row cotangents
                      into (N+1, 64) (shade_winners_kp bwd tail)
  winners regather  — backward re-gather of (T*P*K) rows (recompute path)

Usage: python scripts/binprobe2.py [n] [w] [h] [--iters 8]
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cand", type=int, default=1536)
    args = ap.parse_args()

    from rtgs_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()

    n = args.n
    ntx, nty = -(-args.w // 16), -(-args.h // 16)
    t = ntx * nty
    c = args.cand + 128
    c += (-c) % 128
    p, k = 256, 16
    pairs = 9 * n
    key = jax.random.PRNGKey(0)
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

    # --- candidate-matrix gather (T, C) from sorted stream ---
    val_s = jax.random.randint(key, (pairs,), 0, n, jnp.int32)
    idx0 = jax.random.randint(key, (t, c), 0, pairs, jnp.int32)
    jax.block_until_ready((val_s, idx0))

    def g1(x, i):
        return val_s[(x + i) % pairs]

    chain(f"gather ({t}x{c}) i32", g1, idx0)

    def g2(x, i):
        idx = (x + i) % pairs
        a = val_s[idx]
        b = (val_s[idx] >> 16)
        return a + b

    chain(f"gather x2 same idx", g2, idx0)

    # --- fan-out construction layouts ---
    tx0 = jax.random.randint(key, (n,), 0, ntx, jnp.int32)
    ty0 = jax.random.randint(key, (n,), 0, nty, jnp.int32)
    wx = jax.random.randint(key, (n,), 1, 4, jnp.int32)
    dq = jax.random.randint(key, (n,), 0, 65535, jnp.int32)
    jax.block_until_ready((tx0, ty0, wx, dq))

    def fan_n9(x, i):
        dx = jnp.arange(3, dtype=jnp.int32)
        txs = (tx0 + i)[:, None] + dx[None, :]
        tys = ty0[:, None] + dx[None, :]
        tid = txs[:, :, None] * nty + tys[:, None, :]
        ok = ((dx[None, :, None] < wx[:, None, None])
              & (dx[None, None, :] < wx[:, None, None]))
        keyv = jnp.where(ok, tid * 65536 + dq[:, None, None], 2**31 - 1)
        return x + keyv.reshape(-1)

    def fan_9n(x, i):
        dx = jnp.arange(3, dtype=jnp.int32)
        txs = (tx0 + i)[None, :] + dx[:, None]
        tys = ty0[None, :] + dx[:, None]
        tid = txs[:, None, :] * nty + tys[None, :, :]
        ok = ((dx[:, None, None] < wx[None, None, :])
              & (dx[None, :, None] < wx[None, None, :]))
        keyv = jnp.where(ok, tid * 65536 + dq[None, None, :], 2**31 - 1)
        return x + keyv.reshape(-1)

    z9 = jnp.zeros((pairs,), jnp.int32)
    chain("fanout (N,3,3) minor", fan_n9, z9)
    chain("fanout (3,3,N) major", fan_9n, z9)

    # --- tile-count scatter-add ---
    tile_of = jax.random.randint(key, (pairs,), 0, t + 2, jnp.int32)
    jax.block_until_ready(tile_of)

    def sca(x, i):
        return x * 0 + jnp.zeros((t + 2,), jnp.int32).at[
            (tile_of + i) % (t + 2)].add(1, mode="drop")

    chain(f"scatter-add {pairs//1000}k->T", sca,
          jnp.zeros((t + 2,), jnp.int32))

    # --- backward tails ---
    m = t * p * k
    rows_cot = jax.random.normal(key, (m, 64), jnp.float32)
    safe = jax.random.randint(key, (m,), 0, n + 1, jnp.int32)
    packed = jnp.zeros((n + 1, 64), jnp.float32)
    jax.block_until_ready((rows_cot, safe, packed))

    def scat_rows(x, i):
        d = jnp.zeros_like(packed).at[(safe + i) % (n + 1)].add(rows_cot)
        return x + d[0, 0]

    chain(f"rows-cot scatter ({m//1000}k,64)", scat_rows, jnp.float32(0.0))

    big = jax.random.normal(key, (n + 1, 64), jnp.float32)
    jax.block_until_ready(big)

    def regather(x, i):
        r = big[(safe + i) % (n + 1)]
        return x + r.sum() * 0 + r[0, 0]

    chain(f"winners regather ({m//1000}k,64)", regather, jnp.float32(0.0))


if __name__ == "__main__":
    main()
