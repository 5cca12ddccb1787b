"""Microbenchmarks of elementary Pallas ops at the peel kernel's shapes.

Isolates why per-chunk VPU work measures ~70x above theory: each variant is
one pallas_call, grid (T,), block (1, P, C), doing a single op chain.

Usage: python scripts/kmicro.py [--t 960] [--p 256] [--c 128]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make(t, p, c, body):
    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[pl.BlockSpec((1, p, c), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, p, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, p, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )


import numpy as np


def sync_time(fn, x, iters=5):
    """block_until_ready alone does not reliably block on the tunneled
    backend — force a small host readback of the result."""
    _ = np.asarray(fn(x)[0, :1, :8])
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(x)[0, :1, :8])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=960)
    ap.add_argument("--p", type=int, default=256)
    ap.add_argument("--c", type=int, default=128)
    args = ap.parse_args()
    t, p, c = args.t, args.p, args.c

    from rtgs_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()

    x = jax.random.uniform(jax.random.PRNGKey(0), (t, p, c),
                           minval=0.1, maxval=3.0)
    jax.block_until_ready(x)
    n = t * p * c
    print(f"# device={jax.devices()[0]} t={t} p={p} c={c} "
          f"bytes={2*n*4/1e6:.0f}MB per call")
    # Readback floor: time to pull 32B from an already-materialized array.
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        _ = np.asarray(x[0, :1, :8])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"# readback floor: {ts[3]*1e3:.2f} ms")

    variants = {
        "copy": lambda v: v,
        "mult": lambda v: v * 1.0001,
        "chain10": lambda v: functools.reduce(
            lambda a, _: a * 1.0001 + 1e-9, range(10), v),
        "div": lambda v: 1.0 / v,
        "sqrt": lambda v: jnp.sqrt(v),
        "exp": lambda v: jnp.exp(v),
        "exp2": lambda v: jnp.exp2(v),
        "exp_where": lambda v: jnp.where(v > 1.0, jnp.exp(v), 0.0),
        "min_reduce": lambda v: jnp.broadcast_to(
            jnp.min(v, axis=-1, keepdims=True), v.shape),
    }
    for name, body in variants.items():
        try:
            t0 = time.time()
            fn = jax.jit(make(t, p, c, body))
            dt = sync_time(fn, x)
            gbs = 2 * n * 4 / dt / 1e9
            print(f"{name:10s}: {dt*1e3:8.2f} ms  {gbs:6.1f} GB/s "
                  f" {n/dt/1e9:7.2f} Gelem/s  [compile {time.time()-t0:.0f}s]")
        except Exception as e:
            print(f"{name:10s}: FAIL {type(e).__name__} {str(e)[:80]}")


if __name__ == "__main__":
    main()
