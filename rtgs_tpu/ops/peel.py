"""Fused Pallas TPU kernel: intersect + depth-select + composite, fwd & bwd.

This is the hot path the BASELINE.json north star names: "per-ray Gaussian
intersection, depth-ordered hit sorting, and front-to-back alpha compositing
become fused Pallas kernels with a hand-derived backward pass". One grid
program per screen tile; the tile's candidate features stream HBM → VMEM once
and every (pixel × candidate) intermediate lives only in VMEM — no per-layer
HBM round trips (the reference launches one kernel per layer and re-traverses
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
V = (1−a) V — no division by (1−a), so opacity → 1 stays finite. Gradients
then chain through α = op·exp(B²/4A − (c0+3)) to (m6, Me, c0, op) and through
rgb = color + y·sh to (color, sh); the per-tile feature gradients are
scatter-added over candidates outside the kernel, and XLA's VJP of the
(differentiable) feature packing carries them to the scene parameters.
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


def _fwd_kernel(depth, feats_ref, pix_ref, out_ref):
    # out rows: 0..2 = rgb radiance, 3 = transmittance (packed in one
    # (4, P) block — Mosaic requires sublane-dim blocks of 8 or the full
    # array dim, so a separate (1, P) trans output would not lower).
    feats = feats_ref[0]
    pix = pix_ref[0]
    t1, alpha, r, g, b, _, _, _ = _intersect(feats, pix)
    p = t1.shape[0]

    def body(_, carry):
        t1m, rr, rg, rb, tr = carry
        first = _select_first(t1m).astype(t1m.dtype)
        a_s = jnp.sum(first * alpha, -1, keepdims=True)  # (P, 1)
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
    out_ref[0, 0, :] = rr[:, 0]
    out_ref[0, 1, :] = rg[:, 0]
    out_ref[0, 2, :] = rb[:, 0]
    out_ref[0, 3, :] = tr[:, 0]


def _bwd_kernel(depth, feats_ref, pix_ref, grad_out_ref, dfeats_ref):
    # grad_out rows: 0..2 = radiance cotangent, 3 = transmittance cotangent.
    feats = feats_ref[0]
    pix = pix_ref[0]
    t1, alpha, r, g, b, a_quad, b_quad, rho = _intersect(feats, pix)
    p, c = t1.shape

    # Forward re-peel, recording per-layer selections (one-hots stay
    # implicit: we store the selected scalar per layer plus re-derive the
    # one-hot in the reverse sweep from the recorded fidx).
    def fwd_body(k, carry):
        t1m, tr, tks, aks, rks, gks, bks, fks = carry
        firstb = _select_first(t1m)
        first = firstb.astype(t1m.dtype)
        a_s = jnp.sum(first * alpha, -1, keepdims=True)
        tks = jax.lax.dynamic_update_slice(tks, tr, (0, k))
        aks = jax.lax.dynamic_update_slice(aks, a_s, (0, k))
        rks = jax.lax.dynamic_update_slice(
            rks, jnp.sum(first * r, -1, keepdims=True), (0, k))
        gks = jax.lax.dynamic_update_slice(
            gks, jnp.sum(first * g, -1, keepdims=True), (0, k))
        bks = jax.lax.dynamic_update_slice(
            bks, jnp.sum(first * b, -1, keepdims=True), (0, k))
        lane = jax.lax.broadcasted_iota(jnp.int32, t1m.shape, 1)
        fidx = jnp.min(jnp.where(firstb, lane, c), -1, keepdims=True)
        fks = jax.lax.dynamic_update_slice(
            fks, fidx.astype(jnp.float32), (0, k))
        tr = tr * (1.0 - a_s)
        t1m = jnp.where(firstb, jnp.inf, t1m)
        return t1m, tr, tks, aks, rks, gks, bks, fks

    zk = jnp.zeros((p, depth), jnp.float32)
    _, _, tks, aks, rks, gks, bks, fks = jax.lax.fori_loop(
        0, depth, fwd_body,
        (t1, jnp.ones((p, 1), jnp.float32), zk, zk, zk, zk, zk,
         jnp.full((p, depth), float(c), jnp.float32)))

    g_r = grad_out_ref[0, 0, :][:, None]   # (P, 1)
    g_g = grad_out_ref[0, 1, :][:, None]
    g_b = grad_out_ref[0, 2, :][:, None]
    g_t = grad_out_ref[0, 3, :][:, None]

    lane = jax.lax.broadcasted_iota(jnp.int32, (p, c), 1)

    # Reverse sweep: U (suffix radiance per channel), V (suffix trans).
    def bwd_body(i, carry):
        ur, ug, ub, v, gA, gR, gG, gB = carry
        k = depth - 1 - i
        tk = jax.lax.dynamic_slice(tks, (0, k), (p, 1))
        ak = jax.lax.dynamic_slice(aks, (0, k), (p, 1))
        rk = jax.lax.dynamic_slice(rks, (0, k), (p, 1))
        gk = jax.lax.dynamic_slice(gks, (0, k), (p, 1))
        bk = jax.lax.dynamic_slice(bks, (0, k), (p, 1))
        fk = jax.lax.dynamic_slice(fks, (0, k), (p, 1))
        onehot = (lane == fk.astype(jnp.int32)).astype(jnp.float32)

        grad_a = (g_r * tk * (rk - ur) + g_g * tk * (gk - ug)
                  + g_b * tk * (bk - ub) - g_t * tk * v)
        w = tk * ak
        gA = gA + onehot * grad_a
        gR = gR + onehot * (g_r * w)
        gG = gG + onehot * (g_g * w)
        gB = gB + onehot * (g_b * w)

        ur = ak * rk + (1.0 - ak) * ur
        ug = ak * gk + (1.0 - ak) * ug
        ub = ak * bk + (1.0 - ak) * ub
        v = (1.0 - ak) * v
        return ur, ug, ub, v, gA, gR, gG, gB

    z1 = jnp.zeros((p, 1), jnp.float32)
    zc = jnp.zeros((p, c), jnp.float32)
    _, _, _, _, gA, gR, gG, gB = jax.lax.fori_loop(
        0, depth, bwd_body,
        (z1, z1, z1, jnp.ones((p, 1), jnp.float32), zc, zc, zc, zc))

    # Chain α = op·ρ, ρ = exp(B²/4A − (c0+3)) (valid), and rgb = col + y·sh.
    d = pix[:, 0:3]
    fd = pix[:, 3:9]
    y = pix[:, 9:24]
    op = feats[:, 10]
    galpha = gA  # (P, C) grad wrt α at selected sites
    # ∂α/∂A = α · (−B²/4A²); ∂α/∂B = α · B/(2A); ∂α/∂c0 = −α; ∂α/∂op = ρ.
    alpha_safe = alpha
    a_q = a_quad
    b_q = b_quad
    dA = galpha * alpha_safe * (-(b_q * b_q) / (4.0 * a_q * a_q))
    dB = galpha * alpha_safe * (b_q / (2.0 * a_q))
    dC0 = -galpha * alpha_safe
    # ∂α/∂op = ρ on accepted hits (α may be 0 with ρ > 0 only when the hit
    # was rejected, i.e. t1 = inf — mask by acceptance, not by α > 0, so
    # gradient can still revive a low-opacity Gaussian).
    dOp = galpha * rho * jnp.isfinite(t1).astype(jnp.float32)

    contract_t = (((0,), (0,)), ((), ()))  # (P,·)ᵀ-style contraction over P
    dm6 = jax.lax.dot_general(dA, fd, contract_t,
                              preferred_element_type=jnp.float32)  # (C, 6)
    dme = 2.0 * jax.lax.dot_general(dB, d, contract_t,
                                    preferred_element_type=jnp.float32)
    dc0 = jnp.sum(dC0, axis=0)           # (C,)
    dop = jnp.sum(dOp, axis=0)
    dcol_r = jnp.sum(gR, axis=0)
    dcol_g = jnp.sum(gG, axis=0)
    dcol_b = jnp.sum(gB, axis=0)
    dsh_r = jax.lax.dot_general(gR, y, contract_t,
                                preferred_element_type=jnp.float32)  # (C, 15)
    dsh_g = jax.lax.dot_general(gG, y, contract_t,
                                preferred_element_type=jnp.float32)
    dsh_b = jax.lax.dot_general(gB, y, contract_t,
                                preferred_element_type=jnp.float32)

    dfeats_ref[0, :, 0:6] = dm6
    dfeats_ref[0, :, 6:9] = dme
    dfeats_ref[0, :, 9] = dc0
    dfeats_ref[0, :, 10] = dop
    dfeats_ref[0, :, 11] = dcol_r
    dfeats_ref[0, :, 12] = dcol_g
    dfeats_ref[0, :, 13] = dcol_b
    dfeats_ref[0, :, 14:29] = dsh_r
    dfeats_ref[0, :, 29:44] = dsh_g
    dfeats_ref[0, :, 44:59] = dsh_b
    dfeats_ref[0, :, 59:64] = jnp.zeros_like(dfeats_ref[0, :, 59:64])


def _pallas_fwd(gathered, pix, depth: int):
    t, c, f = gathered.shape
    p = pix.shape[1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, depth),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, c, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, G_DIM), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, 4, p), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(gathered, pix)
    return out[:, 0:3, :], out[:, 3, :]


def _pallas_bwd(gathered, pix, grad_rad, grad_trans, depth: int):
    t, c, f = gathered.shape
    p = pix.shape[1]
    grad_out = jnp.concatenate([grad_rad, grad_trans[:, None, :]], axis=1)
    dfeats = pl.pallas_call(
        functools.partial(_bwd_kernel, depth),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, c, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, G_DIM), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, c, f), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
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
    same selection loop), vmapped over tiles. Used by tests as the autodiff
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
