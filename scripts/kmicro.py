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

    return make_raw(t, p, c, kernel)


def make_raw(t, p, c, kernel):
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


# --- raw-kernel variants: the peel kernel's suspect op patterns ---------


def _k_any_when(x_ref, o_ref):
    """Vector→scalar predicate + branch, once per grid step (the chunk-skip
    pattern `@pl.when(jnp.any(t1 < kth))`)."""
    v = x_ref[...]
    pred = jnp.any(v < 0.5)

    @pl.when(pred)
    def _a():
        o_ref[...] = v * 2.0

    @pl.when(jnp.logical_not(pred))
    def _b():
        o_ref[...] = v


def _k_any_when8(x_ref, o_ref):
    """8 predicated blocks per grid step."""
    v = x_ref[...]
    o_ref[...] = v
    for i in range(8):
        pred = jnp.any(v < 0.1 * i)

        @pl.when(pred)
        def _a(i=i):
            o_ref[...] = v * (1.0 + i)


def _k_fori16(x_ref, o_ref):
    v = x_ref[...]

    def body(_, a):
        return a * 1.0001 + 1e-9

    o_ref[...] = jax.lax.fori_loop(0, 16, body, v)


def _k_fori128_tiny(x_ref, o_ref):
    """128 loop iterations of one tiny (8, C) op — per-iteration overhead
    of a candidate-insertion loop."""
    o_ref[...] = x_ref[...]
    row = jax.lax.fori_loop(
        0, 128, lambda i, a: a * 1.0001, x_ref[0, 0:8, :])
    o_ref[0, 0:8, :] = row


def _k_dynslice_sub(x_ref, o_ref):
    """128 dynamic sublane slices (1, C) inside a fori_loop — the
    transposed insertion pattern's per-candidate read."""
    v = x_ref[...]

    def body(i, acc):
        return acc + jax.lax.dynamic_slice(
            v, (0, i % v.shape[1], 0), (1, 1, v.shape[2]))

    acc = jax.lax.fori_loop(
        0, 128, body, jnp.zeros((1, 1, x_ref.shape[2]), jnp.float32))
    o_ref[...] = v
    o_ref[0, 0:1, :] = acc[0]


def _k_argmin_pass(x_ref, o_ref):
    """One full argmin-extract pass over (P, C): min + tie-break + 6
    masked extract sums — the top-K merge's per-layer cost unit."""
    v = x_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
    m = jnp.min(v, axis=-1, keepdims=True)
    fin = m < jnp.inf
    sel = (v == m) & fin
    fidx = jnp.min(jnp.where(sel, lane, v.shape[-1]), axis=-1, keepdims=True)
    first = (lane == fidx) & fin
    acc = 0.0
    for _ in range(6):
        s = jnp.sum(jnp.where(first, v, 0.0), axis=-1, keepdims=True)
        acc = acc + s
        v = v * 1.0001
    o_ref[...] = x_ref[...]
    o_ref[0, :, 0:1] = acc[0]


def _k_matvec_ones(x_ref, o_ref):
    """Lane-axis reduction via MXU matvec instead of VPU reduce."""
    v = x_ref[0]
    ones = jnp.ones((v.shape[1], 8), jnp.float32)
    s = jax.lax.dot_general(v, ones, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = x_ref[...]
    o_ref[0, :, 0:8] = s


def _k_roll_sub16(x_ref, o_ref):
    """16 sublane rolls + selects — the sorted-insert shift pattern."""
    v = x_ref[...]
    for _ in range(16):
        r = pltpu.roll(v, 1, 1)
        v = jnp.where(v > r, r, v)
    o_ref[...] = v


# --- the chunk-loop patterns from the production kernel, isolated -------


def _k_loop13_static(x_ref, o_ref):
    """fori_loop of 13 iterations, static slice, pure vector op."""
    def body(c, acc):
        return acc + x_ref[0, 0:32, :] * 1.0001

    acc = jax.lax.fori_loop(
        0, 13, body, jnp.zeros((32, x_ref.shape[2]), jnp.float32))
    o_ref[...] = x_ref[...]
    o_ref[0, 0:32, :] = acc


def _k_loop13_dynslice(x_ref, o_ref):
    """fori_loop of 13 iterations, DYNAMIC-offset ref slice (the chunk
    read `feats_ref[:, pl.ds(off, CHUNK), :]`), pure vector op."""
    def body(c, acc):
        off = pl.multiple_of(c * 16, 16)
        return acc + x_ref[0, pl.ds(off, 32), :] * 1.0001

    acc = jax.lax.fori_loop(
        0, 13, body, jnp.zeros((32, x_ref.shape[2]), jnp.float32))
    o_ref[...] = x_ref[...]
    o_ref[0, 0:32, :] = acc


def _k_loop13_anywhen(x_ref, o_ref, s_ref):
    """fori_loop of 13 iterations, static slice, per-iteration
    vector→scalar `any` + pl.when + scratch RMW (the chunk-skip shape)."""
    o_ref[...] = x_ref[...]
    s_ref[...] = jnp.zeros_like(s_ref)

    def body(c, carry):
        v = x_ref[0, 0:32, :] * (1.0 + c)
        kth = s_ref[0:1, 0:1]

        @pl.when(jnp.any(v > kth))
        def _m():
            s_ref[...] = s_ref[...] + jnp.max(v)[None, None]

        return carry

    jax.lax.fori_loop(0, 13, body, 0)
    o_ref[0, 0:1, 0:1] = s_ref[0:1, 0:1]


def _k_loop13_full(x_ref, o_ref, s_ref):
    """Dynamic slice + any/when + scratch RMW together (≈ kprobe shade)."""
    o_ref[...] = x_ref[...]
    s_ref[...] = jnp.zeros_like(s_ref)

    def body(c, carry):
        off = pl.multiple_of(c * 16, 16)
        v = x_ref[0, pl.ds(off, 32), :] * (1.0 + c)
        kth = s_ref[0:1, 0:1]

        @pl.when(jnp.any(v > kth))
        def _m():
            s_ref[...] = s_ref[...] + jnp.max(v)[None, None]

        return carry

    jax.lax.fori_loop(0, 13, body, 0)
    o_ref[0, 0:1, 0:1] = s_ref[0:1, 0:1]


def make_scratch(t, p, c, kernel):
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[pl.BlockSpec((1, p, c), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, p, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, p, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
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
        "min_reduce_sub": lambda v: jnp.broadcast_to(
            jnp.min(v, axis=-2, keepdims=True), v.shape),
    }
    raw_variants = {
        "any_when": _k_any_when,
        "any_when8": _k_any_when8,
        "fori16": _k_fori16,
        "fori128_tiny": _k_fori128_tiny,
        "dynslice_sub": _k_dynslice_sub,
        "argmin_pass": _k_argmin_pass,
        "matvec_ones": _k_matvec_ones,
        "roll_sub16": _k_roll_sub16,
        "loop13_static": _k_loop13_static,
        "loop13_dynslice": _k_loop13_dynslice,
    }
    scratch_variants = {
        "loop13_anywhen": _k_loop13_anywhen,
        "loop13_full": _k_loop13_full,
    }
    builders = [(name, lambda n=name, b=body: make(t, p, c, b))
                for name, body in variants.items()]
    builders += [(name, lambda n=name, k=kern: make_raw(t, p, c, k))
                 for name, kern in raw_variants.items()]
    builders += [(name, lambda n=name, k=kern: make_scratch(t, p, c, k))
                 for name, kern in scratch_variants.items()]
    for name, build in builders:
        try:
            t0 = time.time()
            fn = jax.jit(build())
            dt = sync_time(fn, x)
            gbs = 2 * n * 4 / dt / 1e9
            print(f"{name:14s}: {dt*1e3:8.2f} ms  {gbs:6.1f} GB/s "
                  f" {n/dt/1e9:7.2f} Gelem/s  {dt/t*1e6:6.2f} us/step "
                  f"[compile {time.time()-t0:.0f}s]")
        except Exception as e:
            print(f"{name:14s}: FAIL {type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()
