"""Fused Pallas TPU kernel: intersect + depth-select + composite, fwd & bwd.

This is the hot path the BASELINE.json north star names: "per-ray Gaussian
intersection, depth-ordered hit sorting, and front-to-back alpha compositing
become fused Pallas kernels with a hand-derived backward pass". The grid is
``(tiles, candidate-chunks)``: each screen tile streams its candidate list
through VMEM in chunks of 128, maintaining an exact per-pixel top-K
(K = ``depth``) nearest-hit state in VMEM scratch — top-K of a union is the
top-K of (top-K, next chunk), so the result is identical to a global
depth-peel while VMEM usage stays bounded by the chunk, not the candidate
count (the reference instead launches one kernel per *layer* and re-traverses
its BVH each time, ``/root/reference/src/rtgs/ray_tracer.py:50-54``).

Feature packing (F = 64 lanes):
  [0:6]   Σ⁻¹ packed sym6 (m00, m01, m02, m11, m12, m22)
  [6:9]   Me, e = origin − μ
  [9]     c0 = eᵀMe − 3
  [10]    opacity
  [11:14] base color rgb
  [14:29] SH·r   [29:44] SH·g   [44:59] SH·b
Pixel packing (G = 24 lanes): [0:3] dir, [3:9] d-quadratic features
(dx², 2dxdy, 2dxdz, dy², 2dydz, dz²), [9:24] SH basis y(dir).

Quadratic identities (see render/tiled.py): A = fd·m6, B = 2 d·Me, C = c0;
entry depth t1 = (−B−√Δ)/2A; the reference's midpoint response is
ρ = exp(B²/4A − (c0+3)).

Backward (hand-derived, division-free):
with per-layer opacity aₖ, color cₖ, transmittance Tₖ = Π_{j<k}(1−aⱼ) and
upstream ḡ (radiance) and ḡ_T (transmittance):

  ∂L/∂cₖ = ḡ · Tₖ aₖ
  ∂L/∂aₖ = ḡ · Tₖ (cₖ − Uₖ) − ḡ_T · Tₖ Vₖ,
     Uₖ = Σ_{j>k} Π_{k<i<j}(1−aᵢ) aⱼ cⱼ   (suffix radiance, U_K = 0)
     Vₖ = Π_{j>k}(1−aⱼ)                    (suffix transmittance, V_K = 1)

both computed by a reverse sweep with the recurrences U = a c + (1−a) U,
V = (1−a) V — no division by (1−a), so opacity → 1 stays finite. The
backward grid is ``(tiles, 2·chunks)``: sweep 1 (chunks 0..NC−1) rebuilds
the final top-K state *with candidate-slot indices*, computes the per-layer
cotangents via the suffix recurrences, and sweep 2 (chunks NC..2NC−1)
re-intersects each chunk, masks the layer cotangents onto their owning
lanes, chains through α = op·exp(B²/4A − (c0+3)) and rgb = color + y·sh,
and contracts over pixels into the chunk's (128, F) feature-gradient block.
Per-tile feature gradients are scatter-added over candidates outside the
kernel, and XLA's VJP of the (differentiable) feature packing carries them
to the scene parameters.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F_DIM = 64
G_DIM = 24
CHUNK = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _intersect(feats, pix):
    """Shared fwd math: (C, F) × (P, G) → t1, alpha, r, g, b as (P, C)."""
    d = pix[:, 0:3]          # (P, 3)
    fd = pix[:, 3:9]         # (P, 6)
    y = pix[:, 9:24]         # (P, 15)
    m6 = feats[:, 0:6]       # (C, 6)
    me = feats[:, 6:9]
    c0 = feats[:, 9]         # (C,)
    op = feats[:, 10]
    col = feats[:, 11:14]

    contract = (((1,), (1,)), ((), ()))
    a = jax.lax.dot_general(fd, m6, contract,
                            preferred_element_type=jnp.float32)   # (P, C)
    b = 2.0 * jax.lax.dot_general(d, me, contract,
                                  preferred_element_type=jnp.float32)
    cq = c0[None, :]
    delta = b * b - 4.0 * a * cq
    sq = jnp.sqrt(jnp.where(delta > 0, delta, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    valid = (delta >= 0.0) & (t1 > 0.0)
    rho = jnp.where(delta > 0.0,
                    jnp.exp(b * b / (4.0 * a) - (cq + 3.0)), 0.0)
    alpha = jnp.where(valid, op[None, :] * rho, 0.0)
    t1 = jnp.where(valid, t1, jnp.inf)

    rgb = []
    for ch in range(3):
        sh_ch = feats[:, 14 + 15 * ch: 29 + 15 * ch]  # (C, 15)
        rgb.append(col[:, ch][None, :] + jax.lax.dot_general(
            y, sh_ch, contract, preferred_element_type=jnp.float32))
    return t1, alpha, rgb[0], rgb[1], rgb[2], a, b, rho


def _select_first(t1m):
    """Nearest unconsumed candidate per pixel as a one-hot over lanes."""
    c = t1m.shape[-1]
    m = jnp.min(t1m, axis=-1, keepdims=True)                      # (P, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, t1m.shape, 1)
    sel = (t1m == m) & jnp.isfinite(m)
    fidx = jnp.min(jnp.where(sel, lane, c), axis=-1, keepdims=True)
    return (lane == fidx) & jnp.isfinite(m)                       # (P, C)


def _data_zeros(x, k):
    """(P, k) zeros whose Mosaic layout is *derived from data* ``x``
    ((P, ≥k), non-NaN). Splat-constant (``jnp.zeros``) loop-carry inits are
    layout-inferred as replicated; when the loop body then yields a
    non-replicated value, the backedge would need a non-replicated →
    replicated relayout, which Mosaic rejects ("Invalid relayout:
    Non-singleton logical dimension is replicated in destination but not in
    source"). ``min(|x|, 0)`` is exactly 0 for any non-NaN ``x`` (|±inf| →
    inf → 0) but is not constant-folded, so the carry keeps ``x``'s concrete
    tiled layout."""
    return jnp.minimum(jnp.abs(x[:, :k]), 0.0)


def _col(x, k):
    """Column ``k`` of (P, K) ``x`` as (P, 1) — Mosaic-safe dynamic read
    (no ``dynamic_slice`` lowering on TPU Pallas)."""
    kcol = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.sum(jnp.where(kcol == k, x, 0.0), axis=-1, keepdims=True)


def _setcol(x, k, v):
    """(P, K) ``x`` with column ``k`` replaced by (P, 1) ``v``."""
    kcol = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(kcol == k, v, x)


def _merge_topk(depth, state, chunk):
    """Exact top-K merge: ``state`` (tuple of (P, K) arrays, t1 first,
    sorted ascending) ∪ ``chunk`` (tuple of (P, CHUNK) arrays) → new sorted
    (P, K) state. Ties break to the lower lane, i.e. earlier candidates
    first — the same order as a global argmin peel (state lanes come first
    and hold earlier chunks). Field 0 must be t1; a field may be None to
    skip (returned as None)."""
    p = state[0].shape[0]
    cat = [None if s is None else jnp.concatenate([s, c], axis=-1)
           for s, c in zip(state, chunk)]
    live = [x for x in cat if x is not None]

    def body(k, carry):
        t1m = carry[0]
        outs = carry[1:]
        first = _select_first(t1m)
        new_outs = []
        for x, o in zip(live, outs):
            # where-before-sum (not fw·x) so inf lanes never make 0·inf nan.
            v = jnp.sum(jnp.where(first, x, 0.0), axis=-1, keepdims=True)
            new_outs.append(_setcol(o, k, v))
        t1m = jnp.where(first, jnp.inf, t1m)
        return (t1m,) + tuple(new_outs)

    zeros = [_data_zeros(x, depth) for x in live]
    carry = jax.lax.fori_loop(0, depth, body, (cat[0],) + tuple(zeros))
    outs = list(carry[1:])
    result = []
    i = 0
    for x in cat:
        if x is None:
            result.append(None)
            continue
        result.append(outs[i])
        i += 1
    # Empty layers (nothing selected) stored t1 = 0; a real hit always has
    # t1 > 0, so t1 == 0 ⇔ empty — restore +inf so composite skips them and
    # a later merge treats them as vacant.
    t1_out = result[0]
    result[0] = jnp.where(t1_out > 0.0, t1_out, jnp.inf)
    return tuple(result)


def _composite(depth, alpha_k, r_k, g_k, b_k):
    """Front-to-back composite over sorted layers: (P, K) → (P, 1) × 4."""
    p = alpha_k.shape[0]

    def body(k, carry):
        rr, rg, rb, tr = carry
        a = _col(alpha_k, k)
        w = tr * a
        rr = rr + w * _col(r_k, k)
        rg = rg + w * _col(g_k, k)
        rb = rb + w * _col(b_k, k)
        tr = tr * (1.0 - a)
        return rr, rg, rb, tr

    z = _data_zeros(alpha_k, 1)
    return jax.lax.fori_loop(0, depth, body, (z, z, z, z + 1.0))


def _fwd_kernel(depth, nc, feats_ref, pix_ref, out_ref,
                s_t1, s_alpha, s_r, s_g, s_b):
    # out rows: 0..2 = rgb radiance, 3 = transmittance (packed in one
    # (4, P) block — Mosaic requires sublane-dim blocks of 8 or the full
    # array dim, so a separate (1, P) trans output would not lower).
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        s_t1[...] = jnp.full_like(s_t1, jnp.inf)
        s_alpha[...] = jnp.zeros_like(s_alpha)
        s_r[...] = jnp.zeros_like(s_r)
        s_g[...] = jnp.zeros_like(s_g)
        s_b[...] = jnp.zeros_like(s_b)

    feats = feats_ref[0]
    pix = pix_ref[0]
    t1, alpha, r, g, b, _, _, _ = _intersect(feats, pix)

    nt1, nalpha, nr, ng, nb = _merge_topk(
        depth,
        (s_t1[...], s_alpha[...], s_r[...], s_g[...], s_b[...]),
        (t1, alpha, r, g, b))
    s_t1[...], s_alpha[...] = nt1, nalpha
    s_r[...], s_g[...], s_b[...] = nr, ng, nb

    @pl.when(j == nc - 1)
    def _emit():
        rr, rg, rb, tr = _composite(depth, nalpha, nr, ng, nb)
        out_ref[0, 0, :] = rr[:, 0]
        out_ref[0, 1, :] = rg[:, 0]
        out_ref[0, 2, :] = rb[:, 0]
        out_ref[0, 3, :] = tr[:, 0]


def _layer_cotangents(depth, grad_out, alpha_k, r_k, g_k, b_k):
    """Per-layer cotangents via the division-free suffix recurrences.

    Returns (grad_a, gw_r, gw_g, gw_b) each (P, K): ∂L/∂αₖ and the
    color cotangents ḡ_ch · Tₖ aₖ."""
    p = alpha_k.shape[0]
    g_r = grad_out[0, :][:, None]   # (P, 1)
    g_g = grad_out[1, :][:, None]
    g_b = grad_out[2, :][:, None]
    g_t = grad_out[3, :][:, None]

    # Forward prefix: T_k (P, K).
    def fwd_body(k, carry):
        tks, tr = carry
        a = _col(alpha_k, k)
        tks = _setcol(tks, k, tr)
        return tks, tr * (1.0 - a)

    zk = _data_zeros(alpha_k, depth)
    z1 = _data_zeros(alpha_k, 1)
    tks, _ = jax.lax.fori_loop(0, depth, fwd_body, (zk, z1 + 1.0))

    # Reverse suffix: U (per channel), V.
    def bwd_body(i, carry):
        ur, ug, ub, v, ga, gwr, gwg, gwb = carry
        k = depth - 1 - i
        tk = _col(tks, k)
        ak = _col(alpha_k, k)
        rk = _col(r_k, k)
        gk = _col(g_k, k)
        bk = _col(b_k, k)
        grad_a = (g_r * tk * (rk - ur) + g_g * tk * (gk - ug)
                  + g_b * tk * (bk - ub) - g_t * tk * v)
        w = tk * ak
        ga = _setcol(ga, k, grad_a)
        gwr = _setcol(gwr, k, g_r * w)
        gwg = _setcol(gwg, k, g_g * w)
        gwb = _setcol(gwb, k, g_b * w)
        ur = ak * rk + (1.0 - ak) * ur
        ug = ak * gk + (1.0 - ak) * ug
        ub = ak * bk + (1.0 - ak) * ub
        v = (1.0 - ak) * v
        return ur, ug, ub, v, ga, gwr, gwg, gwb

    out = jax.lax.fori_loop(
        0, depth, bwd_body,
        (z1, z1, z1, z1 + 1.0, zk, zk, zk, zk))
    return out[4], out[5], out[6], out[7]


def _bwd_kernel(depth, nc, feats_ref, pix_ref, grad_out_ref, dfeats_ref,
                s_t1, s_alpha, s_r, s_g, s_b, s_slot,
                s_ga, s_gwr, s_gwg, s_gwb):
    # grad_out rows: 0..2 = radiance cotangent, 3 = transmittance cotangent.
    j = pl.program_id(1)
    feats = feats_ref[0]
    pix = pix_ref[0]
    p = pix.shape[0]
    chunk_idx = jnp.where(j < nc, j, j - nc)

    t1, alpha, r, g, b, a_quad, b_quad, rho = _intersect(feats, pix)
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, CHUNK), 1)
    gslot = (lane + chunk_idx * CHUNK).astype(jnp.float32)

    # ---- Sweep 1 (j < nc): rebuild the top-K state, with slot indices. ----
    @pl.when(j == 0)
    def _init():
        s_t1[...] = jnp.full_like(s_t1, jnp.inf)
        s_alpha[...] = jnp.zeros_like(s_alpha)
        s_r[...] = jnp.zeros_like(s_r)
        s_g[...] = jnp.zeros_like(s_g)
        s_b[...] = jnp.zeros_like(s_b)
        s_slot[...] = jnp.full_like(s_slot, -1.0)

    @pl.when(j < nc)
    def _sweep1():
        nt1, nalpha, nr, ng, nb, nslot = _merge_topk(
            depth,
            (s_t1[...], s_alpha[...], s_r[...], s_g[...], s_b[...],
             s_slot[...]),
            (t1, alpha, r, g, b, gslot))
        # Empty layers got slot 0 from the masked sum; mark them -1 so no
        # lane claims their (zero) cotangent in sweep 2.
        nslot = jnp.where(jnp.isfinite(nt1), nslot, -1.0)
        s_t1[...], s_alpha[...] = nt1, nalpha
        s_r[...], s_g[...], s_b[...] = nr, ng, nb
        s_slot[...] = nslot

    @pl.when(j == nc - 1)
    def _cotangents():
        ga, gwr, gwg, gwb = _layer_cotangents(
            depth, grad_out_ref[0], s_alpha[...], s_r[...], s_g[...],
            s_b[...])
        s_ga[...], s_gwr[...] = ga, gwr
        s_gwg[...], s_gwb[...] = gwg, gwb

    # ---- Sweep 2 (j >= nc): mask cotangents onto lanes, chain, contract.
    @pl.when(j >= nc)
    def _sweep2():
        slot_k = s_slot[...]
        ga_k, gwr_k = s_ga[...], s_gwr[...]
        gwg_k, gwb_k = s_gwg[...], s_gwb[...]

        def body(k, carry):
            gA, gR, gG, gB = carry
            # Empty layers have slot −1, matching no lane.
            sk = _col(slot_k, k)
            onehot = (gslot == sk).astype(jnp.float32)  # (P, CHUNK)
            gA = gA + onehot * _col(ga_k, k)
            gR = gR + onehot * _col(gwr_k, k)
            gG = gG + onehot * _col(gwg_k, k)
            gB = gB + onehot * _col(gwb_k, k)
            return gA, gR, gG, gB

        zc = _data_zeros(alpha, CHUNK)
        gA, gR, gG, gB = jax.lax.fori_loop(
            0, depth, body, (zc, zc, zc, zc))

        # Chain α = op·ρ, ρ = exp(B²/4A − (c0+3)), rgb = col + y·sh.
        d = pix[:, 0:3]
        fd = pix[:, 3:9]
        y = pix[:, 9:24]
        dA = gA * alpha * (-(b_quad * b_quad) / (4.0 * a_quad * a_quad))
        dB = gA * alpha * (b_quad / (2.0 * a_quad))
        dC0 = -gA * alpha
        # ∂α/∂op = ρ on accepted hits (mask by acceptance, not α > 0, so
        # gradient can still revive a low-opacity Gaussian).
        dOp = gA * rho * jnp.isfinite(t1).astype(jnp.float32)

        contract_t = (((0,), (0,)), ((), ()))  # contract over P
        dm6 = jax.lax.dot_general(dA, fd, contract_t,
                                  preferred_element_type=jnp.float32)
        dme = 2.0 * jax.lax.dot_general(dB, d, contract_t,
                                        preferred_element_type=jnp.float32)
        dsh_r = jax.lax.dot_general(gR, y, contract_t,
                                    preferred_element_type=jnp.float32)
        dsh_g = jax.lax.dot_general(gG, y, contract_t,
                                    preferred_element_type=jnp.float32)
        dsh_b = jax.lax.dot_general(gB, y, contract_t,
                                    preferred_element_type=jnp.float32)

        dfeats_ref[0, :, 0:6] = dm6
        dfeats_ref[0, :, 6:9] = dme
        dfeats_ref[0, :, 9] = jnp.sum(dC0, axis=0)
        dfeats_ref[0, :, 10] = jnp.sum(dOp, axis=0)
        dfeats_ref[0, :, 11] = jnp.sum(gR, axis=0)
        dfeats_ref[0, :, 12] = jnp.sum(gG, axis=0)
        dfeats_ref[0, :, 13] = jnp.sum(gB, axis=0)
        dfeats_ref[0, :, 14:29] = dsh_r
        dfeats_ref[0, :, 29:44] = dsh_g
        dfeats_ref[0, :, 44:59] = dsh_b
        dfeats_ref[0, :, 59:64] = jnp.zeros((CHUNK, 5), jnp.float32)


def _pallas_fwd(gathered, pix, depth: int):
    t, c, f = gathered.shape
    assert c % CHUNK == 0, c
    nc = c // CHUNK
    p = pix.shape[1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, depth, nc),
        grid=(t, nc),
        in_specs=[
            pl.BlockSpec((1, CHUNK, f), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, G_DIM), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, p), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, 4, p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((p, depth), jnp.float32)
                        for _ in range(5)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(gathered, pix)
    return out[:, 0:3, :], out[:, 3, :]


def _pallas_bwd(gathered, pix, grad_rad, grad_trans, depth: int):
    t, c, f = gathered.shape
    assert c % CHUNK == 0, c
    nc = c // CHUNK
    p = pix.shape[1]
    grad_out = jnp.concatenate([grad_rad, grad_trans[:, None, :]], axis=1)
    dfeats = pl.pallas_call(
        functools.partial(_bwd_kernel, depth, nc),
        grid=(t, 2 * nc),
        in_specs=[
            pl.BlockSpec(
                (1, CHUNK, f),
                lambda i, j: (i, jnp.where(j < nc, j, j - nc), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, G_DIM), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, CHUNK, f),
            lambda i, j: (i, jnp.maximum(j - nc, 0), 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, c, f), jnp.float32),
        scratch_shapes=[pltpu.VMEM((p, depth), jnp.float32)
                        for _ in range(10)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(gathered, pix, grad_out)
    return dfeats


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def peel_pallas(packed_feats: jnp.ndarray, candidates: jnp.ndarray,
                pix_feats: jnp.ndarray, depth: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused tile peel.

    Args:
      packed_feats: (N+1, 64) per-Gaussian features (row N = sentinel).
      candidates: (T, C) int32 candidate indices, -1 padded; C must be a
        multiple of 128.
      pix_feats: (T, P, 24) per-pixel features; P a multiple of 8.
      depth: composited layers K.

    Returns:
      (radiance (T, 3, P), transmittance (T, P)).
    """
    rad, trans = _peel_fwd_impl(packed_feats, candidates, pix_feats, depth)
    return rad, trans


def _gather(packed_feats, candidates):
    n_sentinel = packed_feats.shape[0] - 1
    safe = jnp.where(candidates >= 0, candidates, n_sentinel)
    return packed_feats[safe], safe  # (T, C, F)


def _peel_fwd_impl(packed_feats, candidates, pix_feats, depth):
    gathered, _ = _gather(packed_feats, candidates)
    return _pallas_fwd(gathered, pix_feats, depth)


def _peel_fwd_rule(packed_feats, candidates, pix_feats, depth):
    out = _peel_fwd_impl(packed_feats, candidates, pix_feats, depth)
    return out, (packed_feats, candidates, pix_feats)


def _peel_bwd_rule(depth, residuals, grads):
    packed_feats, candidates, pix_feats = residuals
    grad_rad, grad_trans = grads
    gathered, safe = _gather(packed_feats, candidates)
    dfeats_tiles = _pallas_bwd(
        gathered, pix_feats, grad_rad, grad_trans, depth)  # (T, C, F)
    # Scatter-add per-candidate grads back to the (N+1, F) table; the
    # sentinel row absorbs padding grads (all zeros anyway).
    dpacked = jnp.zeros_like(packed_feats).at[safe.reshape(-1)].add(
        dfeats_tiles.reshape(-1, packed_feats.shape[1]))
    return dpacked, None, None


peel_pallas.defvjp(_peel_fwd_rule, _peel_bwd_rule)


def peel_reference(packed_feats, candidates, pix_feats, depth: int):
    """Pure-XLA execution of the *identical* kernel math (same `_intersect`,
    same selection order), vmapped over tiles. Used by tests as the autodiff
    oracle for the hand-written backward, and as a CPU fallback."""
    gathered, _ = _gather(packed_feats, candidates)

    def one_tile(feats, pix):
        t1, alpha, r, g, b, _, _, _ = _intersect(feats, pix)
        p = t1.shape[0]

        def body(_, carry):
            t1m, rr, rg, rb, tr = carry
            first = _select_first(t1m).astype(t1m.dtype)
            a_s = jnp.sum(first * alpha, -1, keepdims=True)
            r_s = jnp.sum(first * r, -1, keepdims=True)
            g_s = jnp.sum(first * g, -1, keepdims=True)
            b_s = jnp.sum(first * b, -1, keepdims=True)
            w = tr * a_s
            rr, rg, rb = rr + w * r_s, rg + w * g_s, rb + w * b_s
            tr = tr * (1.0 - a_s)
            t1m = jnp.where(first > 0, jnp.inf, t1m)
            return t1m, rr, rg, rb, tr

        zeros = jnp.zeros((p, 1), jnp.float32)
        ones = jnp.ones((p, 1), jnp.float32)
        _, rr, rg, rb, tr = jax.lax.fori_loop(
            0, depth, body, (t1, zeros, zeros, zeros, ones))
        rad = jnp.concatenate([rr, rg, rb], axis=-1).T  # (3, P)
        return rad, tr[:, 0]

    return jax.vmap(one_tile)(gathered, pix_feats)
