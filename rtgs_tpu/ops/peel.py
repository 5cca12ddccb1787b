"""Fused Pallas TPU kernel: intersect + depth-select + composite, fwd & bwd.

This is the hot path the BASELINE.json north star names: "per-ray Gaussian
intersection, depth-ordered hit sorting, and front-to-back alpha compositing
become fused Pallas kernels with a hand-derived backward pass". Each screen
tile streams its candidate list through VMEM in chunks of 128, maintaining an
exact per-pixel top-K (K = ``depth``) nearest-hit state in the chunk loop's
carry — top-K of a union is the top-K of (top-K, next chunk), so the result
is identical to a global depth-peel while VMEM usage stays bounded by the
chunk, not the candidate count (the reference instead launches one kernel
per *layer* and re-traverses its BVH each time,
``/root/reference/src/rtgs/ray_tracer.py:50-54``).

Performance architecture (round 3 — every claim measured on a v5e chip via
scripts/kmicro.py + scripts/kprobe.py + scripts/stageprobe.py):

  * The grid is one-dimensional over **blocks of BT tiles** (``parallel`` —
    tiles are independent; per-grid-step fixed cost measured ~1.5us).
    Each block's whole candidate feature array rides in as a single
    (BT, C, F) VMEM block (Pallas double-buffers it across steps), and the
    kernel loops over 128-wide candidate chunks *internally* with a
    ``fori_loop`` whose trip count is ``ceil(max-count-in-block / 128)``
    from per-block counts passed as **scalar prefetch** — padding and
    empty tails cost nothing, so the per-tile candidate budget can be
    sized for zero overflow for free.
  * Every chunk runs intersect + shade + merge UNCONDITIONALLY with the
    state in the loop carry. Round 2 predicated the merge on
    ``any(t1 < kth)`` with state in VMEM scratch; measurement killed it:
    at bench density 98% of chunks pass the predicate anyway, and a large
    ``pl.when`` region costs ~7x its unpredicated body (123us vs ~17us) —
    the region boundary + scratch RMW serialize Mosaic's pipeline.
  * Shading is log-domain: the state carries ``qa = B²/4A − eᵀMe +
    log(opacity)`` so ``exp`` runs on (P, K) winners at composite time,
    never on the (P, C) candidate field.
  * The top-K merge is switchable (``RTGS_MERGE``): K argmin-extract
    ``fori_loop`` passes (measured ~10us; NEVER a Python unroll — that
    spilled 280MB of registers in round 2) or a bitonic sorting network
    (ops/lanesort.py, ~17us — lane rotations are slower than the
    reductions they replace on this backend, kept for A/B).

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
backward kernel runs the same 1-D tile-block grid with two internal sweeps:
sweep 1 rebuilds the final top-K state *with candidate-slot indices* (same
chunk-skip predicate as the forward), then the per-layer cotangents come
from the suffix recurrences, and sweep 2 re-intersects each chunk, masks the
layer cotangents onto their owning lanes, chains through
α = op·exp(B²/4A − (c0+3)) and rgb = color + y·sh, and contracts over pixels
into the chunk's (128, F) feature-gradient slice. Sweep 2 skips a chunk
entirely (its output slice stays zero) unless one of the block's K winning
slots actually lives in it — with K ≤ 16 winners in depth-sorted candidate
order, almost every chunk is skipped. Per-tile feature gradients are
scatter-added over candidates outside the kernel, and XLA's VJP of the
(differentiable) feature packing carries them to the scene parameters.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F_DIM = 64
G_DIM = 24
# Candidate-chunk width of the internal sweep (env-tunable for A/B: the
# merge's K extraction passes are serial-latency-bound, so wider chunks
# amortize them over more candidates at the same total reduce work).
# Measured round 4 at 100k@384p: 256 is NEUTRAL (146 vs 142 ms fwd+bwd)
# — the extraction latency is not the binding constraint; 128 stays.
CHUNK = int(os.environ.get("RTGS_CHUNK", "128"))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_block() -> int:
    """Tiles per grid step (env-tunable for kbench sweeps).

    Default 1: Mosaic unrolls vector ops over the leading block dim, and at
    tile_block=4 the register allocator explodes (measured 280MB of spill
    slots vs the chip's 128MB VMEM, ~15-minute compiles); at 1 the forward
    kernel compiles in ~2s. Per-grid-step overhead is already amortized by
    the internal chunk loop."""
    return int(os.environ.get("RTGS_TILE_BLOCK", "1"))


def _merge_mode(depth: int | None = None) -> str:
    """Top-K merge implementation: "argmin" (default — K fori_loop
    argmin-extract passes, measured ~10us per merge in carry-state form)
    or "bitonic" (ops/lanesort.py sorting network, measured ~17us — lane
    rotations on this backend cost more than the cross-lane reductions
    they replace; kept for A/B and for backends where that flips).

    The bitonic network requires power-of-two lane counts (its 2K-lane
    concat asserts otherwise), so non-power-of-two ``depth`` silently uses
    argmin — which supports any depth — instead of failing at trace time
    (ADVICE r3)."""
    mode = os.environ.get("RTGS_MERGE", "argmin")
    if (mode == "bitonic" and depth is not None
            and (depth & (depth - 1)) != 0):
        return "argmin"
    return mode


def _lane(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _intersect_t1(feats, pix):
    """Cheap half of the fwd math: entry depths only.

    feats (B, C, F) × pix (B, P, G) → t1 (B, P, C) (+inf on miss) plus the
    quadratic pieces (a, b, cq, delta) needed by the shading half.
    """
    d = pix[..., 0:3]          # (B, P, 3)
    fd = pix[..., 3:9]         # (B, P, 6)
    m6 = feats[..., 0:6]       # (B, C, 6)
    me = feats[..., 6:9]
    c0 = feats[..., 9]         # (B, C)

    contract = (((2,), (2,)), ((0,), (0,)))
    a = jax.lax.dot_general(fd, m6, contract,
                            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)   # (B, P, C)
    b = 2.0 * jax.lax.dot_general(d, me, contract,
                                  preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    cq = c0[:, None, :]
    delta = b * b - 4.0 * a * cq
    sq = jnp.sqrt(jnp.where(delta > 0, delta, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    valid = (delta >= 0.0) & (t1 > 0.0)
    t1 = jnp.where(valid, t1, jnp.inf)
    return t1, a, b, cq, delta


def _shade(feats, pix, t1, a, b, cq, delta):
    """Expensive half: response + view-dependent color.

    α = opacity · exp(B²/4A − (c0+3)) on accepted hits (Δ == 0 accepts with
    ρ = 0, matching the reference's t2 = inf → midpoint response 0 quirk);
    rgb = base color + SH basis · coefficients.
    """
    y = pix[..., 9:24]         # (B, P, 15)
    op = feats[..., 10]        # (B, C)
    col = feats[..., 11:14]    # (B, C, 3)

    rho = jnp.where(delta > 0.0,
                    jnp.exp(b * b / (4.0 * a) - (cq + 3.0)), 0.0)
    alpha = jnp.where(jnp.isfinite(t1), op[:, None, :] * rho, 0.0)

    contract = (((2,), (2,)), ((0,), (0,)))
    rgb = []
    for ch in range(3):
        sh_ch = feats[..., 14 + 15 * ch: 29 + 15 * ch]  # (B, C, 15)
        rgb.append(col[..., ch][:, None, :] + jax.lax.dot_general(
            y, sh_ch, contract, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
    return alpha, rgb[0], rgb[1], rgb[2], rho


def _intersect(feats, pix):
    """Full fwd math (XLA-path oracle + tests): t1, alpha, r, g, b (B,P,C)."""
    t1, a, b, cq, delta = _intersect_t1(feats, pix)
    alpha, r, g, bl, rho = _shade(feats, pix, t1, a, b, cq, delta)
    return t1, alpha, r, g, bl, a, b, rho


def _shade_q(feats, pix, t1, a, b, cq, delta):
    """Log-domain shading for the bitonic merge path: instead of
    α = op·exp(q) over the whole (P, C) chunk, carry
    ``qa = q + log(op)`` (α = exp(qa)) so the transcendental runs only on
    the K winners at composite time. ``qa = −inf`` for rejected hits and
    the Δ == 0 → ρ = 0 quirk; the log runs on the (B, C) opacity row, not
    the (B, P, C) block. rgb is the same MXU matmuls as :func:`_shade`."""
    y = pix[..., 9:24]
    op = feats[..., 10]        # (B, C)
    col = feats[..., 11:14]

    qa = jnp.where(
        (delta > 0.0) & jnp.isfinite(t1),
        b * b / (4.0 * a) - (cq + 3.0) + jnp.log(op)[:, None, :],
        -jnp.inf)

    contract = (((2,), (2,)), ((0,), (0,)))
    rgb = []
    for ch in range(3):
        sh_ch = feats[..., 14 + 15 * ch: 29 + 15 * ch]  # (B, C, 15)
        rgb.append(col[..., ch][:, None, :] + jax.lax.dot_general(
            y, sh_ch, contract, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
    return qa, rgb[0], rgb[1], rgb[2]


def _alpha_of(t1_k, qa_k):
    """α = exp(qa) on the K winners; vacant layers (t1 = +inf) contribute 0
    regardless of their qa payload (the argmin extract leaves 0 there, the
    bitonic merge leaves whatever sorted in)."""
    return jnp.where(jnp.isfinite(t1_k), jnp.exp(qa_k), 0.0)


def _merge_topk_bitonic(depth, state, chunk, base):
    """Exact top-K merge via sorting networks (no cross-lane reductions).

    state: (t1, ord, *payload) tuples of (..., K) arrays, sorted ascending
      by (t1, ord); ``ord`` is the global candidate slot as f32 (vacant
      lanes: t1 = +inf, ord = +inf).
    chunk: (t1, *payload) tuples of (..., C) arrays (C a power of two).
    base: traced int32 — global slot of the chunk's lane 0.

    Ties break to the lower global slot — identical to the argmin-extract
    merge's "state lanes first, then chunk lane order" and to the
    reference's first-seen-nearest rule (scene.py:429-437).
    """
    from rtgs_tpu.ops.lanesort import (merge_sorted, reverse_half,
                                       sort_by_key)

    use_pltpu = not _interpret()
    st1, sord = state[0], state[1]
    spay = tuple(state[2:])
    ct1 = chunk[0]
    cpay = tuple(chunk[1:])

    lanef = _lane(ct1.shape).astype(jnp.float32)
    ct1s, cords, cpays = sort_by_key(ct1, lanef, cpay, use_pltpu)
    ct1k = ct1s[..., :depth]
    cordk = cords[..., :depth] + base.astype(jnp.float32)
    # Chunk misses sorted to the tail carry t1 = +inf; give them ord = +inf
    # too so they also lose ties against vacant state lanes deterministically.
    cordk = jnp.where(jnp.isfinite(ct1k), cordk, jnp.inf)
    cpayk = tuple(x[..., :depth] for x in cpays)

    def bitonic_cat(s, c):
        return reverse_half(jnp.concatenate([s, c], axis=-1), use_pltpu)

    mt1 = bitonic_cat(st1, ct1k)
    mord = bitonic_cat(sord, cordk)
    mpay = tuple(bitonic_cat(s, c) for s, c in zip(spay, cpayk))
    mt1, mord, mpay = merge_sorted(mt1, mord, mpay, use_pltpu)
    return (mt1[..., :depth], mord[..., :depth]) + tuple(
        x[..., :depth] for x in mpay)


def _merge_topk(depth, state, chunk):
    """Exact top-K merge: ``state`` (tuple of (..., K) arrays, t1 first,
    sorted ascending) ∪ ``chunk`` (tuple of (..., C) arrays) → new sorted
    (..., K) state tuple. Ties break to the lower lane, i.e. earlier
    candidates first — the same order as a global argmin peel (state lanes
    come first and hold earlier chunks). Field 0 must be t1. Empty layers
    come back with t1 = +inf and 0 in every payload field, so a later merge
    treats them as vacant and the composite skips them."""
    cat = [jnp.concatenate([s, c], axis=-1) for s, c in zip(state, chunk)]
    t1m = cat[0]
    nlanes = t1m.shape[-1]
    lane = _lane(t1m.shape)
    outs = [jnp.full_like(state[0], jnp.inf)] + [
        jnp.zeros_like(s) for s in state[1:]]

    # A lax loop, NOT a Python unroll: K unrolled argmin-extract passes give
    # Mosaic's register allocator a huge straight-line SSA graph — measured
    # 280MB of spill slots at tile_block=4 (> the chip's 128MB VMEM). The
    # loop body keeps the live set to cat (loop constants in VMEM) + one
    # t1m + the K-wide outputs.
    klane = _lane(state[0].shape)                           # (..., K)

    def body(k, carry):
        t1m = carry[0]
        m = jnp.min(t1m, axis=-1, keepdims=True)            # (..., 1)
        finite = jnp.isfinite(m)
        sel = (t1m == m) & finite
        fidx = jnp.min(jnp.where(sel, lane, nlanes), axis=-1, keepdims=True)
        first = (lane == fidx) & finite
        at_k = klane == k   # column-k write mask (dynamic_update_slice is
        new_outs = []       # not lowered for values in Pallas TPU)
        for fi, (x, o) in enumerate(zip(cat, carry[1:])):
            # where-before-sum (not fw·x) so inf lanes never make 0·inf nan.
            v = jnp.sum(jnp.where(first, x, 0.0), axis=-1, keepdims=True)
            if fi == 0:
                v = jnp.where(finite, v, jnp.inf)
            new_outs.append(jnp.where(at_k, v, o))
        t1m = jnp.where(first, jnp.inf, t1m)
        return (t1m,) + tuple(new_outs)

    carry = jax.lax.fori_loop(0, depth, body, (t1m,) + tuple(outs))
    return carry[1:]


def _composite(depth, t1_k, qa_k, r_k, g_k, b_k):
    """Front-to-back composite over sorted layers: (..., K) → (..., 1) × 4.
    Layers carry qa (α = exp(qa)); vacant layers (t1 = +inf) contribute 0."""
    alpha_k = _alpha_of(t1_k, qa_k)
    shape = alpha_k.shape[:-1] + (1,)
    rr = jnp.zeros(shape, jnp.float32)
    rg = jnp.zeros(shape, jnp.float32)
    rb = jnp.zeros(shape, jnp.float32)
    tr = jnp.ones(shape, jnp.float32)
    for k in range(depth):
        a = alpha_k[..., k:k + 1]
        w = tr * a
        rr = rr + w * r_k[..., k:k + 1]
        rg = rg + w * g_k[..., k:k + 1]
        rb = rb + w * b_k[..., k:k + 1]
        tr = tr * (1.0 - a)
    return rr, rg, rb, tr


def _init_state(bt, p, depth):
    """Empty top-K state tuple (t1, ord, qa, r, g, b), each (bt, p, K)."""
    inf = jnp.full((bt, p, depth), jnp.inf, jnp.float32)
    zero = jnp.zeros((bt, p, depth), jnp.float32)
    return (inf, inf, -inf, zero, zero, zero)


def _init_keys(bt, p, depth):
    """Empty (t1, ord) key state, each (bt, p, K); ord +inf = vacant."""
    inf = jnp.full((bt, p, depth), jnp.inf, jnp.float32)
    return (inf, inf)


def _peel_mode() -> str:
    """Chunk-sweep structure: "fused" (default — one sweep, the full
    (t1, ord, qa, rgb) state merged per chunk) or "twophase" (keys-only
    merge + payload-extraction sweep). Two-phase looked better on the
    liveness model but measures 3x WORSE on the tunneled v5e (960ms vs
    280ms fwd at 100k@384p): per-fori-iteration work in the extraction
    loops costs ~40x the vreg model there, regardless of op type. Kept
    switchable because the model says it should win on a sane backend."""
    return os.environ.get("RTGS_PEEL", "fused")


def _chunk_update(depth, c, pix, feats_ref, st):
    """Fused chunk step: intersect + log-domain shade + full-state top-K
    merge, unconditionally, state in the fori_loop carry. The measured
    production configuration (656k rays/s fwd+bwd at 100k@384p)."""
    off = pl.multiple_of(c * CHUNK, CHUNK)
    feats = feats_ref[:, pl.ds(off, CHUNK), :]   # (B, CHUNK, F)
    t1, a, b, cq, delta = _intersect_t1(feats, pix)
    qa, r, g, bl = _shade_q(feats, pix, t1, a, b, cq, delta)
    if _merge_mode(depth) == "bitonic":
        return _merge_topk_bitonic(depth, st, (t1, qa, r, g, bl), c * CHUNK)
    gslot = (_lane(t1.shape) + c * CHUNK).astype(jnp.float32)
    nt1, nqa, nr, ng, nb, nord = _merge_topk(
        depth, (st[0], st[2], st[3], st[4], st[5], st[1]),
        (t1, qa, r, g, bl, gslot))
    return (nt1, jnp.where(jnp.isfinite(nt1), nord, jnp.inf),
            nqa, nr, ng, nb)


def _keys_update(depth, c, pix, feats_ref, st):
    """Phase-1 chunk step: intersect + top-K merge of the (t1, global ord)
    KEYS ONLY, state in the fori_loop carry, unconditionally.

    Measured motivation (round 3, scripts/kprobe.py + kmicro.py on v5e):
    a chunk body whose live set holds ≥ 4 (P, C) arrays (t1 + qa + rgb)
    collapses Mosaic's codegen ~20x — shading's qa-part and SH-dots each
    cost < 4us/chunk alone but 81us together — while a 2-array body runs
    at sum-of-parts speed. Payload extraction therefore moves to a second
    sweep over the same chunks (:func:`_extract_update`); the saturation
    predicate of rounds 1-2 is gone because 98% of chunks passed it anyway
    and a taken `pl.when` region costs ~7x its body."""
    off = pl.multiple_of(c * CHUNK, CHUNK)
    feats = feats_ref[:, pl.ds(off, CHUNK), :]   # (B, CHUNK, F)
    t1, _a, _b, _cq, _delta = _intersect_t1(feats, pix)
    if _merge_mode(depth) == "bitonic":
        nt1, nord = _merge_topk_bitonic(depth, st, (t1,), c * CHUNK)[:2]
        return nt1, nord
    gslot = (_lane(t1.shape) + c * CHUNK).astype(jnp.float32)
    nt1, nord = _merge_topk(depth, st, (t1, gslot))
    return nt1, jnp.where(jnp.isfinite(nt1), nord, jnp.inf)


def _merge_topk_rank(depth, state, t1, sid):
    """Rank-matrix variant of :func:`_merge_topk_lex` (round 5,
    ``RTGS_MERGE=rank``): instead of K serial argmin-extract passes (each
    two cross-lane reductions — a ~32-deep latency chain per chunk), rank
    every lane by a blocked pairwise lexicographic comparison
    (``rank_i = #{j : (t1_j, sid_j) < (t1_i, sid_i)}``) and select lanes
    with rank < K by a one-hot weighted sum. More raw VPU ops but a
    ~constant-depth dependency graph; EXACT same result — splat ids are
    unique within a tile, so finite lanes have distinct ranks, and +inf
    lanes can only land in vacant slots (where the inf fill is restored).
    Measured on chip before any default change (see BASELINE.md)."""
    t1m = jnp.concatenate([state[0], t1], axis=-1)
    sidm = jnp.concatenate([state[1], jnp.broadcast_to(sid, t1.shape)],
                           axis=-1)
    l = t1m.shape[-1]
    jb = 8
    assert l % jb == 0, l
    rank = jnp.zeros(t1m.shape, jnp.float32)
    for j0 in range(0, l, jb):
        t1j = t1m[..., j0:j0 + jb]
        sidj = sidm[..., j0:j0 + jb]
        lt = ((t1j[..., :, None] < t1m[..., None, :])
              | ((t1j[..., :, None] == t1m[..., None, :])
                 & (sidj[..., :, None] < sidm[..., None, :])))
        rank = rank + jnp.sum(lt.astype(jnp.float32), axis=-2)
    fin = jnp.isfinite(t1m)
    t1s = jnp.where(fin, t1m, 0.0)        # inf·0 would NaN the sums
    sids = jnp.where(fin, sidm, 0.0)
    klane = _lane(state[0].shape).astype(jnp.float32)       # (..., K)
    # f32 throughout the expansion: Mosaic only supports non-no-op minor
    # dim inserts for 32-bit types (an i1 [..., None] fails to compile).
    finf = fin.astype(jnp.float32)
    oh = ((rank[..., :, None] == klane[..., None, :])
          .astype(jnp.float32) * finf[..., :, None])        # (..., L, K)
    out_t1 = jnp.sum(t1s[..., :, None] * oh, axis=-2)
    out_sid = jnp.sum(sids[..., :, None] * oh, axis=-2)
    hit = jnp.sum(oh, axis=-2) > 0
    return (jnp.where(hit, out_t1, jnp.inf),
            jnp.where(hit, out_sid, jnp.inf))


def _merge_topk_lex(depth, state, t1, sid):
    """Exact top-K merge by LEXICOGRAPHIC (t1, sid) — the splat-id variant
    of :func:`_merge_topk` used by the keys-only kernel.

    ``state``: (t1_k, sid_k) each (..., K), sorted ascending by (t1, sid),
    vacant layers (+inf, +inf). ``t1``/``sid``: the chunk's (..., C)
    depths and (..., C)-broadcastable splat ids (+inf on padding).

    Ties in t1 break to the LOWER SPLAT ID — exactly the reference
    traversal's first-seen-nearest rule over its prim order
    (``/root/reference/src/rtgs/scene.py:429-437``) and our oracle's
    lane order. Each pass extracts the minimum by value (min t1, then min
    sid among the t1-minimal lanes) — no lane-index bookkeeping, which
    also makes this CHEAPER than the slot-ordinal merge (2 cross-lane
    reductions per pass instead of 3)."""
    if _merge_mode(depth) == "rank":
        return _merge_topk_rank(depth, state, t1, sid)
    t1m = jnp.concatenate([state[0], t1], axis=-1)
    sidm = jnp.concatenate([state[1], jnp.broadcast_to(sid, t1.shape)],
                           axis=-1)
    klane = _lane(state[0].shape)                           # (..., K)
    out_t1 = jnp.full_like(state[0], jnp.inf)
    out_sid = jnp.full_like(state[1], jnp.inf)

    def body(k, carry):
        t1m, sidm, out_t1, out_sid = carry
        m = jnp.min(t1m, axis=-1, keepdims=True)            # (..., 1)
        finite = jnp.isfinite(m)
        sel = t1m == m
        s = jnp.min(jnp.where(sel, sidm, jnp.inf), axis=-1,
                    keepdims=True)
        first = sel & (sidm == s)
        at_k = klane == k
        out_t1 = jnp.where(at_k & finite, m, out_t1)
        out_sid = jnp.where(at_k & finite, s, out_sid)
        t1m = jnp.where(first, jnp.inf, t1m)
        return t1m, sidm, out_t1, out_sid

    carry = (t1m, sidm, out_t1, out_sid)
    if _merge_unroll():
        for k in range(depth):
            carry = body(k, carry)
    else:
        carry = jax.lax.fori_loop(0, depth, body, carry)
    return carry[2], carry[3]


SID_LANE = 59


def _intersect_t1_lp(feats, pix):
    """Entry depths in CANDIDATE-MAJOR layout: (B, C, P) instead of
    (B, P, C) — same math as :func:`_intersect_t1`, operands swapped in
    the dot_generals. See :func:`_merge_topk_lex_lp` for why."""
    d = pix[..., 0:3]          # (B, P, 3)
    fd = pix[..., 3:9]         # (B, P, 6)
    m6 = feats[..., 0:6]       # (B, C, 6)
    me = feats[..., 6:9]
    c0 = feats[..., 9]         # (B, C)

    contract = (((2,), (2,)), ((0,), (0,)))
    a = jax.lax.dot_general(m6, fd, contract,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)  # (B, C, P)
    b = 2.0 * jax.lax.dot_general(me, d, contract,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
    cq = c0[..., None]
    delta = b * b - 4.0 * a * cq
    sq = jnp.sqrt(jnp.where(delta > 0, delta, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    valid = (delta >= 0.0) & (t1 > 0.0)
    return jnp.where(valid, t1, jnp.inf)


def _merge_topk_lex_lp(depth, state, t1, sid):
    """Candidate-major (LP) twin of :func:`_merge_topk_lex`: state
    (B, K, P), chunk (B, C, P), merged along axis 1 (the SUBLANE axis).

    Why: the lane-major merge's two reductions per extraction pass each
    collapse 144 LANES — on the (8, 128) VPU a ~8-op in-register shuffle
    tree per 8-row group of the 256 pixels (~256 vector ops per
    reduction). With candidates on the SUBLANE axis the same reduction is
    a pairwise min tree over vregs plus a 3-step cross-sublane roll per
    pixel column (~40 vector ops) — ~6x less reduction work on the vreg
    model. MEASURED (scripts/lpprobe.py, 100k@384p, chip): only −9%
    (45.1 → 41.0 ms kernel) — per-chunk cost on this backend tracks
    total swept lanes, not the reduction op count, so the win is real
    but small; LP also makes the (T, K, P) output layout (what shading
    consumes) free. Results match pk up to dot_general operand order
    (ulp-level t1 differences re-ordering near-ties; the bench parity
    gate bounds the effect). Tie handling is identical: min t1, then
    min sid among the t1-minimal rows."""
    t1m = jnp.concatenate([state[0], t1], axis=1)
    sidm = jnp.concatenate([state[1], sid], axis=1)
    klane = jax.lax.broadcasted_iota(jnp.int32, state[0].shape, 1)
    out_t1 = jnp.full_like(state[0], jnp.inf)
    out_sid = jnp.full_like(state[1], jnp.inf)

    def body(k, carry):
        t1m, sidm, out_t1, out_sid = carry
        m = jnp.min(t1m, axis=1, keepdims=True)             # (B, 1, P)
        finite = jnp.isfinite(m)
        sel = t1m == m
        s = jnp.min(jnp.where(sel, sidm, jnp.inf), axis=1,
                    keepdims=True)
        first = sel & (sidm == s)
        at_k = klane == k
        out_t1 = jnp.where(at_k & finite, m, out_t1)
        out_sid = jnp.where(at_k & finite, s, out_sid)
        t1m = jnp.where(first, jnp.inf, t1m)
        return t1m, sidm, out_t1, out_sid

    carry = (t1m, sidm, out_t1, out_sid)
    if _merge_unroll():
        for k in range(depth):
            carry = body(k, carry)
    else:
        carry = jax.lax.fori_loop(0, depth, body, carry)
    return carry[2], carry[3]


def _merge_unroll() -> bool:
    """Python-unroll the K extraction passes instead of a ``fori_loop``
    (env ``RTGS_MERGE_UNROLL``). Round 2 banned unrolling for the 6-array
    fused state (280 MB of spill at tile_block=4); the keys-only state is
    2 arrays at tile_block=1, and the measured per-fori-iteration overhead
    (~40x the vreg model, scripts/kmicro.py) makes the loop structure
    itself a candidate bottleneck. Measured round 5 (scripts/lpprobe.py,
    100k@384p, chip): unroll −8% on the pk kernel (45.1 → 41.3 ms),
    bitwise-identical output, no spill at the keys state size — so the
    ban is lifted and unroll is the default."""
    return os.environ.get("RTGS_MERGE_UNROLL", "1") == "1"


def _keys_sid_update_lp(depth, c, pix, feats_ref, st):
    """LP chunk step: the winning splat id rides IN the feature table
    (lane ``SID_LANE``, +inf on the sentinel row), so the broadcast to
    (B, C, P) is a free minor-dim broadcast — no separate sid operand and
    no lane→sublane transpose."""
    off = pl.multiple_of(c * CHUNK, CHUNK)
    feats = feats_ref[:, pl.ds(off, CHUNK), :]   # (B, CHUNK, F)
    t1 = _intersect_t1_lp(feats, pix)            # (B, CHUNK, P)
    sid = jnp.broadcast_to(feats[..., SID_LANE:SID_LANE + 1], t1.shape)
    return _merge_topk_lex_lp(depth, st, t1, sid)


def _keys_sid_kernel_lp(depth, bmax_ref, lb_ref, feats_ref, pix_ref,
                        out_ref):
    """LP-layout keys forward: identical semantics (and early termination)
    to :func:`_keys_sid_kernel`; out ROWS instead of lanes: [0:K] t1,
    [K:2K] splat id, each (B, K, P)."""
    i = pl.program_id(0)
    pix = pix_ref[...]
    nc = pl.cdiv(bmax_ref[i], CHUNK)

    def cond(carry):
        c, worst = carry[0], carry[1]
        return (c < nc) & (worst > lb_ref[c, i])

    def body(carry):
        c = carry[0]
        st = _keys_sid_update_lp(depth, c, pix, feats_ref, carry[2:])
        return (c + 1, jnp.max(st[0])) + st

    bt, p = pix.shape[0], pix.shape[1]
    inf = jnp.full((bt, depth, p), jnp.inf, jnp.float32)
    carry = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.float32(jnp.inf), inf, inf))
    out_ref[:, 0:depth, :] = carry[2]
    out_ref[:, depth:2 * depth, :] = carry[3]


def _keys_sid_update(depth, c, pix, feats_ref, sid_ref, st):
    """Keys chunk step carrying SPLAT IDS instead of candidate slots.

    Returning ids directly kills the slot→splat ``take_along_axis`` on
    the XLA side, which measured 40 ms at 100k@384p — 3.9M scalar
    gathers of int32, the single slowest op in the round-4 pipeline."""
    off = pl.multiple_of(c * CHUNK, CHUNK)
    feats = feats_ref[:, pl.ds(off, CHUNK), :]   # (B, CHUNK, F)
    sid = sid_ref[:, :, pl.ds(off, CHUNK)]       # (B, 1, CHUNK)
    t1, _a, _b, _cq, _delta = _intersect_t1(feats, pix)
    return _merge_topk_lex(depth, st, t1, sid)


def _extract_update(depth, c, pix, feats_ref, slot_k, ext):
    """Phase-2 chunk step: re-shade the chunk and gather each winning
    layer's payload by its saved global ord. Runs over the same ``nc``
    chunks as phase 1, unconditionally.

    Deliberately sequenced to keep ≤ ~5 (P, C) arrays live at any point —
    the measured Mosaic codegen cliff (see :func:`_keys_update`): first a
    single CLAIM matrix M (layer index + 1 of the winning layer, else 0),
    then one payload field at a time, recomputed from the feats block and
    folded into the (B, P, K) accumulators through M."""
    off = pl.multiple_of(c * CHUNK, CHUNK)
    feats = feats_ref[:, pl.ds(off, CHUNK), :]
    p_shape = (slot_k.shape[0], pix.shape[1], CHUNK)
    gslot = (_lane(p_shape) + c * CHUNK).astype(jnp.float32)
    klane = jax.lax.broadcasted_iota(jnp.int32, slot_k.shape, 2)

    def claim_body(k, m):
        kk = klane == k
        sk = jnp.sum(jnp.where(kk, slot_k, 0.0), axis=-1, keepdims=True)
        return jnp.where(gslot == sk, (k + 1).astype(jnp.float32), m)

    m = jax.lax.fori_loop(
        0, depth, claim_body, jnp.zeros(p_shape, jnp.float32))

    # Lane-axis reductions run as MXU matvecs against a ones vector —
    # measured free (scripts/kmicro.py `matvec_ones`) where the VPU
    # cross-lane reduce costs ~5us in this loop context.
    ones_c = jnp.ones((CHUNK, 8), jnp.float32)
    red_ct = (((2,), (0,)), ((), ()))

    def extract_field(x, acc):
        def body(k, acc):
            masked = jnp.where(m == (k + 1).astype(jnp.float32), x, 0.0)
            v = jax.lax.dot_general(
                masked, ones_c, red_ct,
                preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)[..., 0:1]
            return jnp.where(klane == k, acc + v, acc)

        return jax.lax.fori_loop(0, depth, body, acc)

    e_qa, e_r, e_g, e_b = ext

    # qa = B²/4A − (c0+3) + log(op); −inf on rejects (Δ ≤ 0 or invalid t1).
    t1, a, b, cq, delta = _intersect_t1(feats, pix)
    op = feats[..., 10]
    qa = jnp.where(
        (delta > 0.0) & jnp.isfinite(t1),
        b * b / (4.0 * a) - (cq + 3.0) + jnp.log(op)[:, None, :],
        -jnp.inf)
    # A claimed vacant-lane qa of −inf must not poison the accumulator
    # (acc starts at −inf only for qa); claims only exist on real winners,
    # so sum-extraction is exact — but −inf + 0 stays −inf, so seed qa's
    # accumulator with 0 where a claim exists, handled by ext init below.
    e_qa = extract_field(qa, e_qa)
    del t1, a, b, delta

    y = pix[..., 9:24]
    col3 = feats[..., 11:14]
    ct = (((2,), (2,)), ((0,), (0,)))
    for ch, acc_in in ((0, e_r), (1, e_g), (2, e_b)):
        sh_ch = feats[..., 14 + 15 * ch: 29 + 15 * ch]
        rgb = col3[..., ch][:, None, :] + jax.lax.dot_general(
            y, sh_ch, ct, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out = extract_field(rgb, acc_in)
        if ch == 0:
            e_r = out
        elif ch == 1:
            e_g = out
        else:
            e_b = out
    return (e_qa, e_r, e_g, e_b)


def _peel_state(depth, nc, pix, feats_ref):
    """The per-tile chunk sweep(s) — see :func:`_peel_mode`. Returns the
    layer state (t1, ord, qa, r, g, b), each (B, P, K); vacant layers
    carry qa = 0 or −inf — callers mask alpha by isfinite(t1)."""
    bt, p = pix.shape[0], pix.shape[1]
    if _peel_mode() != "twophase":
        return jax.lax.fori_loop(
            0, nc, lambda c, st: _chunk_update(depth, c, pix, feats_ref, st),
            _init_state(bt, p, depth))
    keys = jax.lax.fori_loop(
        0, nc, lambda c, st: _keys_update(depth, c, pix, feats_ref, st),
        _init_keys(bt, p, depth))
    zero = jnp.zeros((bt, p, depth), jnp.float32)
    ext = jax.lax.fori_loop(
        0, nc,
        lambda c, e: _extract_update(depth, c, pix, feats_ref, keys[1], e),
        (zero, zero, zero, zero))
    return (keys[0], keys[1]) + ext


def _fwd_kernel(depth, bmax_ref, feats_ref, pix_ref, out_ref):
    # out rows: 0..2 = rgb radiance, 3 = transmittance (packed in one
    # (B, 4, P) block — Mosaic requires sublane-dim blocks of 8 or the full
    # array dim, so a separate (B, 1, P) trans output would not lower).
    i = pl.program_id(0)
    pix = pix_ref[...]                      # (B, P, G)

    st = _peel_state(depth, pl.cdiv(bmax_ref[i], CHUNK), pix, feats_ref)

    rr, rg, rb, tr = _composite(depth, st[0], st[2], st[3], st[4], st[5])
    out_ref[:, 0, :] = rr[..., 0]
    out_ref[:, 1, :] = rg[..., 0]
    out_ref[:, 2, :] = rb[..., 0]
    out_ref[:, 3, :] = tr[..., 0]


def _layer_cotangents(depth, grad_out, alpha_k, r_k, g_k, b_k):
    """Per-layer cotangents via the division-free suffix recurrences.

    grad_out (B, 4, P); layer arrays (B, P, K). Returns
    (grad_a, gw_r, gw_g, gw_b) each (B, P, K): ∂L/∂αₖ and the color
    cotangents ḡ_ch · Tₖ aₖ."""
    g_r = grad_out[:, 0, :][..., None]   # (B, P, 1)
    g_g = grad_out[:, 1, :][..., None]
    g_b = grad_out[:, 2, :][..., None]
    g_t = grad_out[:, 3, :][..., None]

    ones = jnp.ones(alpha_k.shape[:-1] + (1,), jnp.float32)

    # Forward prefix: T_k per layer.
    tks = []
    tr = ones
    for k in range(depth):
        tks.append(tr)
        tr = tr * (1.0 - alpha_k[..., k:k + 1])

    # Reverse suffix: U (per channel), V.
    z = jnp.zeros_like(ones)
    ur, ug, ub, v = z, z, z, ones
    ga = [None] * depth
    gwr = [None] * depth
    gwg = [None] * depth
    gwb = [None] * depth
    for k in range(depth - 1, -1, -1):
        tk = tks[k]
        ak = alpha_k[..., k:k + 1]
        rk = r_k[..., k:k + 1]
        gk = g_k[..., k:k + 1]
        bk = b_k[..., k:k + 1]
        ga[k] = (g_r * tk * (rk - ur) + g_g * tk * (gk - ug)
                 + g_b * tk * (bk - ub) - g_t * tk * v)
        w = tk * ak
        gwr[k] = g_r * w
        gwg[k] = g_g * w
        gwb[k] = g_b * w
        ur = ak * rk + (1.0 - ak) * ur
        ug = ak * gk + (1.0 - ak) * ug
        ub = ak * bk + (1.0 - ak) * ub
        v = (1.0 - ak) * v
    return (jnp.concatenate(ga, -1), jnp.concatenate(gwr, -1),
            jnp.concatenate(gwg, -1), jnp.concatenate(gwb, -1))


def _sweep2_feature_grads(depth, nc, pix, feats_ref, slot_k,
                          ga_k, gwr_k, gwg_k, gwb_k, dfeats_ref):
    """Shared sweep 2 of both backward kernels: re-intersect each chunk,
    claim each winning layer's cotangent onto its owning lane (``slot_k``
    is -1 for vacant layers, matching no lane), chain through
    α = op·exp(B²/4A − (c0+3)) and rgb = color + y·sh, and contract over
    pixels into the chunk's (CHUNK, F) feature-gradient slice. A chunk is
    skipped entirely (its output slice stays zero) unless one of the K
    winning slots lives in it."""
    dfeats_ref[...] = jnp.zeros_like(dfeats_ref)

    def sweep2(c, carry):
        lo = (c * CHUNK).astype(jnp.float32)
        hi = lo + CHUNK
        # Does any winning layer live in this chunk? (slot is -1 for empty
        # layers, matching no chunk.)
        has = jnp.any((slot_k >= lo) & (slot_k < hi))

        @pl.when(has)
        def _compute():
            off = pl.multiple_of(c * CHUNK, CHUNK)
            feats = feats_ref[:, pl.ds(off, CHUNK), :]
            t1, a_quad, b_quad, cq, delta = _intersect_t1(feats, pix)
            alpha, r, g, bl, rho = _shade(
                feats, pix, t1, a_quad, b_quad, cq, delta)
            gslot = (_lane(t1.shape) + c * CHUNK).astype(jnp.float32)

            zc = jnp.zeros_like(t1)
            gA, gR, gG, gB = zc, zc, zc, zc
            for k in range(depth):
                sk = slot_k[..., k:k + 1]
                onehot = gslot == sk            # ≤1 lane per pixel
                gA = gA + jnp.where(onehot, ga_k[..., k:k + 1], 0.0)
                gR = gR + jnp.where(onehot, gwr_k[..., k:k + 1], 0.0)
                gG = gG + jnp.where(onehot, gwg_k[..., k:k + 1], 0.0)
                gB = gB + jnp.where(onehot, gwb_k[..., k:k + 1], 0.0)

            # Chain α = op·ρ, ρ = exp(B²/4A − (c0+3)), rgb = col + y·sh.
            d = pix[..., 0:3]
            fd = pix[..., 3:9]
            y = pix[..., 9:24]
            dA = gA * alpha * (-(b_quad * b_quad)
                               / (4.0 * a_quad * a_quad))
            dB = gA * alpha * (b_quad / (2.0 * a_quad))
            dC0 = -gA * alpha
            # ∂α/∂op = ρ on accepted hits (mask by acceptance, not α > 0, so
            # gradient can still revive a low-opacity Gaussian).
            dOp = gA * rho * jnp.isfinite(t1).astype(jnp.float32)

            # Contract over pixels (dim 1), batched over tiles (dim 0).
            ct = (((1,), (1,)), ((0,), (0,)))
            dm6 = jax.lax.dot_general(dA, fd, ct,
                                      preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
            dme = 2.0 * jax.lax.dot_general(
                dB, d, ct, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
            dsh_r = jax.lax.dot_general(gR, y, ct,
                                        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
            dsh_g = jax.lax.dot_general(gG, y, ct,
                                        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
            dsh_b = jax.lax.dot_general(gB, y, ct,
                                        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
            dblock = jnp.concatenate([
                dm6,                                   # 0:6
                dme,                                   # 6:9
                jnp.sum(dC0, axis=1)[..., None],       # 9
                jnp.sum(dOp, axis=1)[..., None],       # 10
                jnp.sum(gR, axis=1)[..., None],        # 11
                jnp.sum(gG, axis=1)[..., None],        # 12
                jnp.sum(gB, axis=1)[..., None],        # 13
                dsh_r, dsh_g, dsh_b,                   # 14:59
                jnp.zeros(dm6.shape[:-1] + (5,), jnp.float32),  # 59:64
            ], axis=-1)                                # (B, CHUNK, F)
            dfeats_ref[:, pl.ds(off, CHUNK), :] = dblock

        return carry

    jax.lax.fori_loop(0, nc, sweep2, 0)


def _bwd_kernel(depth, bmax_ref, feats_ref, pix_ref, grad_out_ref,
                dfeats_ref):
    # grad_out rows: 0..2 = radiance cotangent, 3 = transmittance cotangent.
    i = pl.program_id(0)
    pix = pix_ref[...]                      # (B, P, G)
    nc = pl.cdiv(bmax_ref[i], CHUNK)

    # ---- Sweep 1+1.5: rebuild the top-K keys, then extract payloads
    # (same two-phase structure as the forward — see _peel_state). ----
    st = _peel_state(depth, nc, pix, feats_ref)

    alpha_k = _alpha_of(st[0], st[2])
    ga_k, gwr_k, gwg_k, gwb_k = _layer_cotangents(
        depth, grad_out_ref[...], alpha_k, st[3], st[4], st[5])
    # Vacant layers carry slot +inf from the merge; mark them -1 so no
    # lane claims their (zero) cotangent in sweep 2.
    slot_k = jnp.where(jnp.isfinite(st[0]), st[1], -1.0)

    _sweep2_feature_grads(depth, nc, pix, feats_ref, slot_k,
                          ga_k, gwr_k, gwg_k, gwb_k, dfeats_ref)


def _fwd_topk_kernel(depth, bmax_ref, feats_ref, pix_ref, out_ref):
    """Forward that emits the top-K layer state instead of compositing.

    out lanes: [0:K] t1, [K:2K] alpha, [2K:3K] r, [3K:4K] g, [4K:5K] b —
    per pixel, depth-ascending. This is the per-shard primitive of the
    primitive-sharded ring renderer: K-lists from different shards merge by
    t1 into exactly the global K-list (SURVEY.md §5 long-axis equivalent).
    """
    i = pl.program_id(0)
    pix = pix_ref[...]
    bt, p = pix.shape[0], pix.shape[1]

    st = _peel_state(depth, pl.cdiv(bmax_ref[i], CHUNK), pix, feats_ref)

    out_ref[:, :, 0 * depth:1 * depth] = st[0]
    out_ref[:, :, 1 * depth:2 * depth] = _alpha_of(st[0], st[2])
    out_ref[:, :, 2 * depth:3 * depth] = st[3]
    out_ref[:, :, 3 * depth:4 * depth] = st[4]
    out_ref[:, :, 4 * depth:5 * depth] = st[5]


def _bwd_topk_kernel(depth, bmax_ref, feats_ref, pix_ref, grad_layers_ref,
                     dfeats_ref):
    """Backward for the top-K-output forward: the caller's autodiff (through
    the XLA-side merge + composite) supplies the per-layer cotangents
    directly (grad lanes [0:K] = ∂L/∂αₖ, [K:2K]/[2K:3K]/[3K:4K] = ∂L/∂(rgb)ₖ;
    the t1 cotangent is identically zero — ordering is piecewise constant),
    so this kernel is sweep 1 + sweep 2 of ``_bwd_kernel`` without the
    suffix-recurrence stage."""
    i = pl.program_id(0)
    pix = pix_ref[...]
    nc = pl.cdiv(bmax_ref[i], CHUNK)

    st = _peel_state(depth, nc, pix, feats_ref)

    gl = grad_layers_ref[...]                    # (B, P, 4K)
    ga_k = gl[..., 0 * depth:1 * depth]
    gwr_k = gl[..., 1 * depth:2 * depth]
    gwg_k = gl[..., 2 * depth:3 * depth]
    gwb_k = gl[..., 3 * depth:4 * depth]
    slot_k = jnp.where(jnp.isfinite(st[0]), st[1], -1.0)

    _sweep2_feature_grads(depth, nc, pix, feats_ref, slot_k,
                          ga_k, gwr_k, gwg_k, gwb_k, dfeats_ref)


def _pallas_fwd_topk(gathered, counts, pix, depth: int):
    t, c, f = gathered.shape
    assert c % CHUNK == 0, c
    p = pix.shape[1]
    gathered, bmax, pix, bt, nb, _ = _block_pad(gathered, counts, pix)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, c, f), lambda i, bmax_ref: (i, 0, 0)),
            pl.BlockSpec((bt, p, G_DIM), lambda i, bmax_ref: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, p, 5 * depth),
                               lambda i, bmax_ref: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_topk_kernel, depth),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bt, p, 5 * depth), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(bmax, gathered, pix)
    out = out[:t]
    return (out[..., 0 * depth:1 * depth], out[..., 1 * depth:2 * depth],
            out[..., 2 * depth:3 * depth], out[..., 3 * depth:4 * depth],
            out[..., 4 * depth:5 * depth])


def _pallas_bwd_topk(gathered, counts, pix, grad_layers, depth: int):
    t, c, f = gathered.shape
    assert c % CHUNK == 0, c
    p = pix.shape[1]
    gathered, bmax, pix, bt, nb, (grad_layers,) = _block_pad(
        gathered, counts, pix, grad_layers)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, c, f), lambda i, bmax_ref: (i, 0, 0)),
            pl.BlockSpec((bt, p, G_DIM), lambda i, bmax_ref: (i, 0, 0)),
            pl.BlockSpec((bt, p, 4 * depth), lambda i, bmax_ref: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, c, f), lambda i, bmax_ref: (i, 0, 0)),
    )
    dfeats = pl.pallas_call(
        functools.partial(_bwd_topk_kernel, depth),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bt, c, f), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(bmax, gathered, pix, grad_layers)
    return dfeats[:t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def peel_topk_pallas(packed_feats, candidates, pix_feats, depth: int):
    """Fused tile top-K: per-pixel K nearest layers, NOT composited.

    Same inputs as :func:`peel_pallas`; returns ``(t1, alpha, r, g, b)``
    each ``(T, P, K)`` depth-ascending (misses: t1 = inf, payload 0). Used
    by the primitive-sharded ring renderer, which merges K-lists across
    shards in XLA and composites once. Differentiable in alpha/rgb (the t1
    ordering is piecewise-constant, like ``lax.top_k``)."""
    return _peel_topk_fwd_impl(packed_feats, candidates, pix_feats, depth)


def _peel_topk_fwd_impl(packed_feats, candidates, pix_feats, depth):
    gathered, _ = _gather(packed_feats, candidates)
    return _pallas_fwd_topk(gathered, _counts(candidates), pix_feats, depth)


def _peel_topk_fwd_rule(packed_feats, candidates, pix_feats, depth):
    out = _peel_topk_fwd_impl(packed_feats, candidates, pix_feats, depth)
    return out, (packed_feats, candidates, pix_feats)


def _peel_topk_bwd_rule(depth, residuals, grads):
    packed_feats, candidates, pix_feats = residuals
    _d_t1, d_alpha, d_r, d_g, d_b = grads   # t1 cotangent is structurally 0
    grad_layers = jnp.concatenate([d_alpha, d_r, d_g, d_b], axis=-1)
    gathered, safe = _gather(packed_feats, candidates)
    dfeats_tiles = _pallas_bwd_topk(
        gathered, _counts(candidates), pix_feats, grad_layers, depth)
    dpacked = jnp.zeros_like(packed_feats).at[safe.reshape(-1)].add(
        dfeats_tiles.reshape(-1, packed_feats.shape[1]))
    return dpacked, None, None


peel_topk_pallas.defvjp(_peel_topk_fwd_rule, _peel_topk_bwd_rule)


def _keys_sid_kernel(depth, bmax_ref, lb_ref, feats_ref, sid_ref, pix_ref,
                     out_ref):
    """Keys-only forward returning (t1, splat id) per layer — see
    :func:`_keys_sid_update`. out lanes: [0:K] t1, [K:2K] splat id (f32,
    exact for ids < 2²⁴; +inf vacant).

    Early termination (round 5, VERDICT r4 #1): the binning emits each
    tile's candidates sorted by a conservative entry-depth lower bound and
    supplies the per-chunk suffix minimum of that bound (``lb_ref``,
    scalar-prefetched (nb, NC+1) f32). The chunk sweep is a while loop
    that stops as soon as every pixel's K-th nearest hit is closer than
    the bound of every remaining candidate — at that point no remaining
    candidate can enter any top-K list, so the result is EXACTLY the full
    sweep's (the parity tests and the in-bench chip gate compare against
    the sweep-free XLA twin). Tiles where some pixel has fewer than K
    hits keep a +inf slot, so ``worst`` stays +inf and the sweep runs to
    the end — exactness over speed; dense tiles (the expensive ones) are
    the ones that stop early."""
    i = pl.program_id(0)
    pix = pix_ref[...]
    nc = pl.cdiv(bmax_ref[i], CHUNK)

    def cond(carry):
        c, worst = carry[0], carry[1]
        # lb is (NC+1, nb): chunk-major, TILE-minor. SMEM prefetch pads
        # the MINOR dim to 128, so the tile-minor layout costs
        # (NC+1)·pad(nb) — the (nb, NC+1) layout padded every tile's 14
        # bound entries to 128 and blew the 1 MB SMEM budget at 3600
        # tiles (1.84 MB — the round-5 250k@720p bench failure).
        return (c < nc) & (worst > lb_ref[c, i])

    def body(carry):
        c = carry[0]
        st = _keys_sid_update(depth, c, pix, feats_ref, sid_ref,
                              carry[2:])
        # st[0] is per-pixel sorted ascending, so its global max is the
        # max over pixels of the K-th nearest t1 (+inf while any pixel
        # still has a vacant layer).
        return (c + 1, jnp.max(st[0])) + st

    carry = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.float32(jnp.inf))
        + _init_keys(pix.shape[0], pix.shape[1], depth))
    out_ref[:, :, 0:depth] = carry[2]
    out_ref[:, :, depth:2 * depth] = carry[3]


def _keys_kernel_layout() -> str:
    """Internal kernel data layout: "lp" (default — candidates on the
    sublane axis, pixels on lanes; the merge's reductions run as vreg
    min-trees + 3-step sublane rolls) or "pk" (the round-4 lane-major
    form; reductions shuffle across 144 lanes). Identical results; see
    :func:`_merge_topk_lex_lp` for the measured reasoning."""
    return os.environ.get("RTGS_KEYS_LAYOUT", "lp")


def peel_keys_pallas(packed_feats, candidates, pix_feats, depth: int,
                     chunk_lb=None, out_layout: str = "pk"):
    """Fused keys-only tile top-K (see :func:`_keys_sid_kernel` /
    :func:`_keys_sid_kernel_lp`).

    Args/shapes as :func:`peel_pallas`. Returns ``(t1, sid)`` each
    ``(T, P, K)`` depth-ascending (``out_layout="kp"`` → ``(T, K, P)``,
    free in the LP kernel layout and what the shading stage consumes);
    ``sid`` is the winning GAUSSIAN INDEX as f32 (+inf for vacant
    layers) — returning ids instead of candidate slots saves a measured
    40 ms slot→splat translation gather. NOT differentiable — callers
    must ``stop_gradient`` the inputs (:func:`peel_keys` does).

    ``chunk_lb``: optional (T, C/CHUNK + 1) f32 per-chunk suffix
    entry-depth lower bounds from ``tile_candidates(..., chunk=CHUNK)``;
    enables exact early termination. ``None`` → zeros → full sweep."""
    gathered, _ = _gather(packed_feats, candidates)
    t, c, f = gathered.shape
    assert c % CHUNK == 0, c
    p = pix_feats.shape[1]
    ncol = c // CHUNK + 1
    if chunk_lb is None:
        chunk_lb = jnp.zeros((t, ncol), jnp.float32)
    assert chunk_lb.shape == (t, ncol), (chunk_lb.shape, (t, ncol))
    lp = _keys_kernel_layout() == "lp"
    if lp:
        # The LP kernel reads each candidate's splat id from feature lane
        # SID_LANE (a free minor-dim broadcast to (B, C, P) in-kernel; a
        # separate (C,)-shaped operand would need a lane→sublane
        # transpose). Stamp the GATHERED block's lane directly (cheaper
        # than rewriting the (N+1, F) table and robust to caller-packed
        # tables); -1 padding gets +inf = vacant.
        sid_rows = jnp.where(candidates >= 0,
                             candidates.astype(jnp.float32), jnp.inf)
        gathered = gathered.at[:, :, SID_LANE].set(sid_rows)
        extra = (chunk_lb,)
    else:
        # (T, 1, C) so the BlockSpec's last two dims equal the array dims
        # (Mosaic's block-shape divisibility rule).
        sidf = jnp.where(candidates >= 0, candidates.astype(jnp.float32),
                         jnp.inf)[:, None, :]
        extra = (sidf, chunk_lb)
    gathered, bmax, pix, bt, nb, extra = _block_pad(
        gathered, _counts(candidates), pix_feats, *extra)
    chunk_lb = extra[-1]
    if bt > 1:
        # Per grid step, the sweep bound must hold for every tile in the
        # block: take the blockwise min (padding rows are +inf-free zeros,
        # which simply disable early stop for partially-padded blocks).
        chunk_lb = jnp.min(chunk_lb.reshape(nb, bt, ncol), axis=1)
    else:
        chunk_lb = chunk_lb.reshape(nb, ncol)
    chunk_lb = chunk_lb.T  # (NC+1, nb): tile-minor, see kernel cond

    if lp:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((bt, c, f), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((bt, p, G_DIM), lambda i, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((bt, 2 * depth, p),
                                   lambda i, *_: (i, 0, 0)),
        )
        out = pl.pallas_call(
            functools.partial(_keys_sid_kernel_lp, depth),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb * bt, 2 * depth, p),
                                           jnp.float32),
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(bmax, chunk_lb, gathered, pix)
        out = out[:t]
        t1_kp, sid_kp = out[:, 0:depth, :], out[:, depth:2 * depth, :]
        if out_layout == "kp":
            return t1_kp, sid_kp
        return t1_kp.transpose(0, 2, 1), sid_kp.transpose(0, 2, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, c, f), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((bt, 1, c), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((bt, p, G_DIM), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, p, 2 * depth),
                               lambda i, *_: (i, 0, 0)),
    )
    sidf = extra[0]
    out = pl.pallas_call(
        functools.partial(_keys_sid_kernel, depth),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bt, p, 2 * depth), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(bmax, chunk_lb, gathered, sidf, pix)
    out = out[:t]
    t1_k, sid_k = out[..., 0:depth], out[..., depth:2 * depth]
    if out_layout == "kp":
        return t1_k.transpose(0, 2, 1), sid_k.transpose(0, 2, 1)
    return t1_k, sid_k


def peel_keys_xla(packed_feats, candidates, pix_feats, depth: int):
    """Identical-semantics keys via a lexicographic (t1, sid) lane sort —
    ties break to the lower splat id, exactly like the kernel's
    :func:`_merge_topk_lex` (and the oracle's lane order)."""
    gathered, _ = _gather(packed_feats, candidates)
    t1, _a, _b, _cq, _delta = _intersect_t1(gathered, pix_feats)
    sid = jnp.where(candidates >= 0, candidates.astype(jnp.float32),
                    jnp.inf)
    sid = jnp.broadcast_to(sid[:, None, :], t1.shape)
    t1_s, sid_s = jax.lax.sort((t1, sid), dimension=-1, num_keys=2)
    t1_k = t1_s[..., :depth]
    # Vacant layers (no hit): mask the sid — a miss still carries its
    # candidate's id through the sort.
    sid_k = jnp.where(jnp.isfinite(t1_k), sid_s[..., :depth], jnp.inf)
    return t1_k, sid_k


def peel_keys(packed_feats, candidates, pix_feats, depth: int,
              impl: str = "auto", chunk_lb=None, out_layout: str = "pk"):
    """Backend dispatcher for the keys-only top-K primitive. Index
    selection is piecewise-constant in the scene parameters, so inputs are
    stop_gradient'ed here — gradients flow through the XLA winner shading
    instead (render/tiled.py:shade_winners_kp).

    ``impl``: "auto" (Pallas on TPU, XLA elsewhere), "pallas", or "xla" —
    the explicit modes exist for the on-chip parity gate (bench.py renders
    the same frame through both and compares). ``chunk_lb`` (optional)
    enables exact early termination in the Pallas kernel; the XLA twin
    ignores it (its one-shot sort needs no sweep), which is what makes the
    parity gate a check of the termination logic too. ``out_layout``:
    "pk" → (T, P, K) results, "kp" → (T, K, P) (free in the LP kernel
    layout; what the shading stage consumes)."""
    packed_feats = jax.lax.stop_gradient(packed_feats)
    pix_feats = jax.lax.stop_gradient(pix_feats)
    if chunk_lb is not None:
        # The early-termination bounds derive from the scene (binning's
        # entry-depth lower bounds) — differentiable inputs that would
        # otherwise drag a JVP into the non-differentiable pallas_call.
        chunk_lb = jax.lax.stop_gradient(chunk_lb)
    use_pallas = (jax.default_backend() == "tpu" if impl == "auto"
                  else impl == "pallas")
    if use_pallas:
        return peel_keys_pallas(packed_feats, candidates, pix_feats, depth,
                                chunk_lb=chunk_lb, out_layout=out_layout)
    out = peel_keys_xla(packed_feats, candidates, pix_feats, depth)
    if out_layout == "kp":
        return tuple(x.transpose(0, 2, 1) for x in out)
    return out


def _counts(candidates):
    """Per-tile candidate count = last valid slot + 1 (robust to interior
    -1 gaps; the binning stage emits contiguous prefixes so this is tight)."""
    t, c = candidates.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, c), 1)
    return jnp.max(jnp.where(candidates >= 0, lane + 1, 0), axis=1)


def _block_pad(gathered, counts, pix, *extra):
    """Pad the tile axis to a multiple of the tile block; return per-block
    max counts (the internal chunk-loop trip count)."""
    t = gathered.shape[0]
    bt = max(1, min(_tile_block(), t))
    nb = -(-t // bt)
    pad = nb * bt - t
    if pad:
        gathered = jnp.pad(gathered, ((0, pad),) + ((0, 0),) * 2)
        pix = jnp.pad(pix, ((0, pad),) + ((0, 0),) * 2)
        counts = jnp.pad(counts, (0, pad))
        extra = tuple(jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
                      for x in extra)
    bmax = jnp.max(counts.reshape(nb, bt), axis=1)
    return gathered, bmax, pix, bt, nb, extra


def _pallas_fwd(gathered, counts, pix, depth: int):
    t, c, f = gathered.shape
    assert c % CHUNK == 0, c
    p = pix.shape[1]
    gathered, bmax, pix, bt, nb, _ = _block_pad(gathered, counts, pix)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, c, f), lambda i, bmax_ref: (i, 0, 0)),
            pl.BlockSpec((bt, p, G_DIM), lambda i, bmax_ref: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, 4, p), lambda i, bmax_ref: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, depth),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bt, 4, p), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(bmax, gathered, pix)
    out = out[:t]
    return out[:, 0:3, :], out[:, 3, :]


def _pallas_bwd(gathered, counts, pix, grad_rad, grad_trans, depth: int):
    t, c, f = gathered.shape
    assert c % CHUNK == 0, c
    p = pix.shape[1]
    grad_out = jnp.concatenate([grad_rad, grad_trans[:, None, :]], axis=1)
    gathered, bmax, pix, bt, nb, (grad_out,) = _block_pad(
        gathered, counts, pix, grad_out)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bt, c, f), lambda i, bmax_ref: (i, 0, 0)),
            pl.BlockSpec((bt, p, G_DIM), lambda i, bmax_ref: (i, 0, 0)),
            pl.BlockSpec((bt, 4, p), lambda i, bmax_ref: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, c, f), lambda i, bmax_ref: (i, 0, 0)),
    )
    dfeats = pl.pallas_call(
        functools.partial(_bwd_kernel, depth),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bt, c, f), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(bmax, gathered, pix, grad_out)
    return dfeats[:t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def peel_pallas(packed_feats: jnp.ndarray, candidates: jnp.ndarray,
                pix_feats: jnp.ndarray, depth: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused tile peel.

    Args:
      packed_feats: (N+1, 64) per-Gaussian features (row N = sentinel).
      candidates: (T, C) int32 candidate indices, -1 padded; C must be a
        multiple of 128. Valid indices should form a contiguous prefix per
        tile (the binning stage guarantees it); interior -1s are correct but
        forfeit the chunk-skip speedup past them.
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
    return _pallas_fwd(gathered, _counts(candidates), pix_feats, depth)


def _peel_fwd_rule(packed_feats, candidates, pix_feats, depth):
    out = _peel_fwd_impl(packed_feats, candidates, pix_feats, depth)
    return out, (packed_feats, candidates, pix_feats)


def _peel_bwd_rule(depth, residuals, grads):
    packed_feats, candidates, pix_feats = residuals
    grad_rad, grad_trans = grads
    gathered, safe = _gather(packed_feats, candidates)
    dfeats_tiles = _pallas_bwd(
        gathered, _counts(candidates), pix_feats, grad_rad, grad_trans,
        depth)  # (T, C, F)
    # Scatter-add per-candidate grads back to the (N+1, F) table; the
    # sentinel row absorbs padding grads (all zeros anyway).
    dpacked = jnp.zeros_like(packed_feats).at[safe.reshape(-1)].add(
        dfeats_tiles.reshape(-1, packed_feats.shape[1]))
    return dpacked, None, None


peel_pallas.defvjp(_peel_fwd_rule, _peel_bwd_rule)


def peel_reference(packed_feats, candidates, pix_feats, depth: int):
    """Pure-XLA execution of the *identical* kernel math (same `_intersect`,
    same selection order), batched over tiles. Used by tests as the autodiff
    oracle for the hand-written backward, and as a CPU fallback."""
    gathered, _ = _gather(packed_feats, candidates)
    t1, alpha, r, g, b, _, _, _ = _intersect(gathered, pix_feats)
    nlanes = t1.shape[-1]
    lane = _lane(t1.shape)

    def body(_, carry):
        t1m, rr, rg, rb, tr = carry
        m = jnp.min(t1m, axis=-1, keepdims=True)
        finite = jnp.isfinite(m)
        sel = (t1m == m) & finite
        fidx = jnp.min(jnp.where(sel, lane, nlanes), axis=-1,
                       keepdims=True)
        first = ((lane == fidx) & finite).astype(t1m.dtype)
        a_s = jnp.sum(first * alpha, -1, keepdims=True)
        r_s = jnp.sum(first * r, -1, keepdims=True)
        g_s = jnp.sum(first * g, -1, keepdims=True)
        b_s = jnp.sum(first * b, -1, keepdims=True)
        w = tr * a_s
        rr, rg, rb = rr + w * r_s, rg + w * g_s, rb + w * b_s
        tr = tr * (1.0 - a_s)
        t1m = jnp.where(first > 0, jnp.inf, t1m)
        return t1m, rr, rg, rb, tr

    shape = t1.shape[:-1] + (1,)
    zeros = jnp.zeros(shape, jnp.float32)
    ones = jnp.ones(shape, jnp.float32)
    _, rr, rg, rb, tr = jax.lax.fori_loop(
        0, depth, body, (t1, zeros, zeros, zeros, ones))
    rad = jnp.concatenate([rr, rg, rb], axis=-1)       # (T, P, 3)
    return rad.transpose(0, 2, 1), tr[..., 0]          # (T, 3, P), (T, P)


def peel_topk_xla(packed_feats, candidates, pix_feats, depth: int):
    """Identical-semantics top-K via ``jax.lax.top_k`` + autodiff (no
    Pallas). Ties break to the lower lane, same as the kernel's
    argmin-extract. Used as the CPU/GPU fallback of :func:`peel_topk` —
    the Pallas interpreter is orders of magnitude too slow for full-scale
    scenes on CPU."""
    gathered, _ = _gather(packed_feats, candidates)
    t1, alpha, r, g, b, _a, _b, _rho = _intersect(gathered, pix_feats)
    negt, idx = jax.lax.top_k(-t1, depth)

    def take(x):
        return jnp.take_along_axis(x, idx, axis=-1)

    return -negt, take(alpha), take(r), take(g), take(b)


def peel_topk(packed_feats, candidates, pix_feats, depth: int):
    """Backend dispatcher for the per-tile top-K primitive: the fused
    Pallas kernel on TPU, the XLA formulation elsewhere."""
    if jax.default_backend() == "tpu":
        return peel_topk_pallas(packed_feats, candidates, pix_feats, depth)
    return peel_topk_xla(packed_feats, candidates, pix_feats, depth)
