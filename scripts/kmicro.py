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
        v = x_ref[0, 0:8, :] * (1.0 + c)
        kth = s_ref[0:8, :]

        @pl.when(jnp.any(v > kth))
        def _m():
            s_ref[...] = jnp.maximum(s_ref[...], v)

        return carry

    jax.lax.fori_loop(0, 13, body, 0)
    o_ref[0, 0:8, :] = s_ref[...]


def _k_loop13_full(x_ref, o_ref, s_ref):
    """Dynamic slice + any/when + scratch RMW together (≈ kprobe shade)."""
    o_ref[...] = x_ref[...]
    s_ref[...] = jnp.zeros_like(s_ref)

    def body(c, carry):
        off = pl.multiple_of(c * 16, 16)
        v = x_ref[0, pl.ds(off, 8), :] * (1.0 + c)
        kth = s_ref[0:8, :]

        @pl.when(jnp.any(v > kth))
        def _m():
            s_ref[...] = jnp.maximum(s_ref[...], v)

        return carry

    jax.lax.fori_loop(0, 13, body, 0)
    o_ref[0, 0:8, :] = s_ref[...]


def _k_concat144(x_ref, o_ref):
    """Lane-axis concat to a non-native 144-lane width + ops on it (the
    merge's `cat = concatenate([state(16), chunk(128)], -1)` pattern)."""
    v = x_ref[...]                               # (1, P, 128)
    cat = jnp.concatenate([v[..., 0:16], v], axis=-1)   # (1, P, 144)
    m = jnp.min(cat, axis=-1, keepdims=True)
    o_ref[...] = v * 1.0001
    o_ref[0, :, 0:1] = m[0]


def _k_merge16(x_ref, o_ref):
    """One production _merge_topk: 5-field state(16) ∪ chunk(128)."""
    from rtgs_tpu.ops.peel import _merge_topk

    v = x_ref[...]
    state = tuple(v[..., 0:16] * (1.0 + i) for i in range(5))
    chunk = tuple(v * (1.0 + i) for i in range(5))
    outs = _merge_topk(16, state, chunk)
    o_ref[...] = v * 1.0001
    o_ref[0, :, 0:16] = outs[0][0]
    o_ref[0, :, 16:32] = outs[1][0]


def _k_merge16_loop(x_ref, o_ref):
    """fori_loop(13) of the production merge, state in loop CARRY (no
    scratch, no predicate)."""
    from rtgs_tpu.ops.peel import _merge_topk

    v = x_ref[...]
    state = tuple(jnp.full_like(v[..., 0:16], jnp.inf) if i == 0
                  else jnp.zeros_like(v[..., 0:16]) for i in range(5))

    def body(c, st):
        chunk = tuple(v * (1.0 + i + c) for i in range(5))
        return _merge_topk(16, st, chunk)

    state = jax.lax.fori_loop(0, 13, body, state)
    o_ref[...] = v * 1.0001
    o_ref[0, :, 0:16] = state[0][0]
    o_ref[0, :, 16:32] = state[1][0]


def _k_bitonic16_loop(x_ref, o_ref):
    """fori_loop(13) of the bitonic merge, state in loop carry."""
    from rtgs_tpu.ops.peel import _merge_topk_bitonic

    v = x_ref[...]
    st = (jnp.full_like(v[..., 0:16], jnp.inf),
          jnp.full_like(v[..., 0:16], jnp.inf),
          jnp.zeros_like(v[..., 0:16]), jnp.zeros_like(v[..., 0:16]),
          jnp.zeros_like(v[..., 0:16]), jnp.zeros_like(v[..., 0:16]))

    def body(c, st):
        chunk = tuple(v * (1.0 + i + c) for i in range(5))
        return _merge_topk_bitonic(16, st, chunk, c * 128)

    st = jax.lax.fori_loop(0, 13, body, st)
    o_ref[...] = v * 1.0001
    o_ref[0, :, 0:16] = st[0][0]
    o_ref[0, :, 16:32] = st[2][0]


def _k_bitonic16_scratch(x_ref, o_ref, s_ref):
    """fori_loop(13) of the bitonic merge, state in VMEM scratch +
    pl.when predicate (the production shape)."""
    from rtgs_tpu.ops.peel import _merge_topk_bitonic

    v = x_ref[...]
    k = 16
    s_ref[...] = jnp.concatenate(
        [jnp.full((1, v.shape[1], 2 * k), jnp.inf),
         jnp.zeros((1, v.shape[1], 4 * k))], axis=-1).astype(jnp.float32)

    def body(c, carry):
        t1 = v * (1.0 + c)
        kth = s_ref[..., k - 1:k]

        @pl.when(jnp.any(t1 < kth))
        def _m():
            st = tuple(s_ref[..., i * k:(i + 1) * k] for i in range(6))
            chunk = tuple(v * (1.0 + i + c) for i in range(5))
            out = _merge_topk_bitonic(k, st, chunk, c * 128)
            for i in range(6):
                s_ref[..., i * k:(i + 1) * k] = out[i]

        return carry

    jax.lax.fori_loop(0, 13, body, 0)
    o_ref[...] = v * 1.0001
    o_ref[0, :, 0:96] = s_ref[0]


def _k_chunkbody(x_ref, o_ref, s_ref):
    """The production kernel's FULL per-chunk body 13× (intersect matmuls
    + log-domain shade + predicated merge into scratch): reproduces the
    combined register pressure that no isolated variant shows."""
    from rtgs_tpu.ops.peel import (_intersect_t1, _merge_topk_bitonic,
                                   _shade_q)

    k = 16
    pix = x_ref[0, :, 0:24][None]             # (1, 256, 24)
    s_ref[...] = jnp.concatenate(
        [jnp.full((1, x_ref.shape[1], 2 * k), jnp.inf),
         jnp.full((1, x_ref.shape[1], k), -jnp.inf),
         jnp.zeros((1, x_ref.shape[1], 3 * k))], axis=-1).astype(jnp.float32)

    def body(c, carry):
        off = pl.multiple_of((c % 2) * 64, 64)
        feats = x_ref[0, pl.ds(off, 128), 0:64][None]   # (1, 128, 64)
        t1, a, b, cq, delta = _intersect_t1(feats, pix)
        kth = s_ref[..., k - 1:k]

        # Forced true (c >= 0): the real scene merges on 98% of chunks, so
        # measure the always-merge cost, not the skip path.
        @pl.when(jnp.any(t1 < kth) | (c >= 0))
        def _m():
            qa, r, g, bl = _shade_q(feats, pix, t1, a, b, cq, delta)
            st = tuple(s_ref[..., i * k:(i + 1) * k] for i in range(6))
            out = _merge_topk_bitonic(k, st, (t1, qa, r, g, bl), c * 128)
            for i in range(6):
                s_ref[..., i * k:(i + 1) * k] = out[i]

        return carry

    jax.lax.fori_loop(0, 13, body, 0)
    o_ref[...] = x_ref[...] * 1.0001
    o_ref[0, :, 0:96] = s_ref[0]


def _mk_chunkbody_carry(merge):
    def kern(x_ref, o_ref):
        """intersect + log-shade + merge EVERY chunk, state in fori_loop
        CARRY — no pl.when, no scratch."""
        from rtgs_tpu.ops.peel import (_intersect_t1, _merge_topk,
                                       _merge_topk_bitonic, _shade_q)

        k = 16
        pix = x_ref[0, :, 0:24][None]
        p = x_ref.shape[1]
        inf = jnp.full((1, p, k), jnp.inf)
        st = (inf, inf, jnp.full((1, p, k), -jnp.inf),
              jnp.zeros((1, p, k)), jnp.zeros((1, p, k)),
              jnp.zeros((1, p, k)))

        def body(c, st):
            off = pl.multiple_of((c % 2) * 64, 64)
            feats = x_ref[0, pl.ds(off, 128), 0:64][None]
            t1, a, b, cq, delta = _intersect_t1(feats, pix)
            qa, r, g, bl = _shade_q(feats, pix, t1, a, b, cq, delta)
            if merge == "bitonic":
                return _merge_topk_bitonic(
                    k, st, (t1, qa, r, g, bl), c * 128)
            nt1, nqa, nr, ng, nb, nord = _merge_topk(
                k, (st[0], st[2], st[3], st[4], st[5], st[1]),
                (t1, qa, r, g, bl,
                 (jax.lax.broadcasted_iota(jnp.int32, t1.shape, 2)
                  + c * 128).astype(jnp.float32)))
            return (nt1, nord, nqa, nr, ng, nb)

        st = jax.lax.fori_loop(0, 13, body, st)
        o_ref[...] = x_ref[...] * 1.0001
        o_ref[0, :, 0:16] = st[0][0]
        o_ref[0, :, 16:32] = st[2][0]

    return kern


def make_scratch16(t, p, c, kernel):
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[pl.BlockSpec((1, p, c), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, p, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, p, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, p, 96), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )


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
        "concat144": _k_concat144,
        "merge16": _k_merge16,
        "merge16_loop": _k_merge16_loop,
        "bitonic16_loop": _k_bitonic16_loop,
    }
    scratch_variants = {
        "loop13_anywhen": _k_loop13_anywhen,
        "loop13_full": _k_loop13_full,
    }
    scratch16_variants = {
        "bitonic16_scr": _k_bitonic16_scratch,
        "chunkbody": _k_chunkbody,
    }
    raw_variants["body_carry_bit"] = _mk_chunkbody_carry("bitonic")
    raw_variants["body_carry_arg"] = _mk_chunkbody_carry("argmin")
    builders = [(name, lambda n=name, b=body: make(t, p, c, b))
                for name, body in variants.items()]
    builders += [(name, lambda n=name, k=kern: make_raw(t, p, c, k))
                 for name, kern in raw_variants.items()]
    builders += [(name, lambda n=name, k=kern: make_scratch(t, p, c, k))
                 for name, kern in scratch_variants.items()]
    builders += [(name, lambda n=name, k=kern: make_scratch16(t, p, c, k))
                 for name, kern in scratch16_variants.items()]
    only = [s for s in os.environ.get("KMICRO_ONLY", "").split(",") if s]
    for name, build in builders:
        if only and name not in only:
            continue
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
