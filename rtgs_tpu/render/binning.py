"""Screen-tile candidate binning — the TPU-native acceleration structure.

The reference accelerates ray casts with a pointer-based SAH BVH traversed by
a per-thread stack (``/root/reference/src/rtgs/scene.py:162-450``) — a
GPU/Taichi idiom that is hostile to XLA (data-dependent pointer chasing,
dynamic trip counts). The TPU replacement: **conservative screen-tile
candidate lists**, built fully on-device with static shapes:

  1. project every Gaussian's 3σ AABB (the reference's own bound semantics,
     ``gaussian.py:104-138``) into the image,
  2. enumerate the tile rectangle it covers (bounded fan-out per Gaussian),
  3. sort the (tile, depth) key pairs once with ``jax.lax.sort``,
  4. scatter into a fixed-width ``(tiles, C)`` candidate matrix.

This is also the design the reference *intended* for its stubbed rasterizer
(tile + depth keys, then a GPU radix sort — ``rasterizer.py:47-71``); here it
serves the exact ray-traced pipeline instead of an EWA approximation.

Soundness: a ray through a pixel hits the ``xᵀΣ⁻¹x=3`` ellipsoid only if the
hit point lies in the Gaussian's AABB (the endpoint AABB is conservative for
this level set), and a convex set fully in front of the camera projects into
the convex hull of its corner projections — so binning by projected-AABB tile
overlap never misses a true hit. Gaussians whose AABB touches the camera
plane, or that span more tiles than the local fan-out cap, go to a per-frame
**global list** appended to every tile (bounded, counted).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rtgs_tpu import gaussians as G
from rtgs_tpu.camera import Camera
from rtgs_tpu.utils import quaternion as quat

_INT32_MAX = jnp.iinfo(jnp.int32).max


def _tree_cumsum(x, block: int = 1024):
    """Inclusive cumsum of a flat int array with COMPILE-CHEAP structure.

    XLA:TPU compile time for long-axis scans explodes with the scanned
    length (round-4 chipless bisect: a 1M monolithic ``jnp.cumsum``
    compiles in 30 s; the round-3 two-level ``associative_scan`` form is
    far worse — >13 min at 8M). Short-axis cumsums are cheap regardless
    of batch, so recurse: reshape to (m, block), cumsum each block along
    the short axis, and recur on the m block totals. Compiles in ~1 s at
    13M elements."""
    n = x.shape[0]
    if n <= block:
        return jnp.cumsum(x)
    m = -(-n // block)
    xp = jnp.pad(x, (0, m * block - n)).reshape(m, block)
    inner = jnp.cumsum(xp, axis=1)
    totals = inner[:, -1]
    carry = _tree_cumsum(totals, block) - totals  # exclusive block offset
    return (inner + carry[:, None]).reshape(-1)[:n]


class GradPlan(NamedTuple):
    """Gather-based per-splat gradient accumulation plan (round 5).

    The shade backward pre-reduces winner cotangents to per-tile
    candidate rows ``d_cand`` (T, C, F) with a mask-matmul; this plan
    turns the final per-splat accumulation into a GATHER + sum instead of
    a scatter/segment_sum (measured 35 ms for the T·C-row segment_sum at
    100k@384p vs ~5 ms for the gather form): every splat knows the ≤
    ``narrow² + 1`` flat positions its candidate copies landed at in the
    ``[d_cand | d_glob | 0]`` value space, because the binning's sort is
    invertible (the pair stream carries its pre-sort position).

    Attributes:
      gather_idx: (narrow² + 1, N) int32 — for each splat, its narrow
        fan-out slots + its global slot, as indices into the flat value
        space ``[T·C rows | C tile-summed global rows | one zero row]``;
        dead/overflowed slots point at the zero row.
      wide_idx: (mtx·mty, wlimit) int32 or None — same, for the
        compacted wide-class splats.
      wide_ids: (wlimit,) int32 or None — the wide splat ids (N = dead).
    """

    gather_idx: jnp.ndarray
    wide_idx: jnp.ndarray | None
    wide_ids: jnp.ndarray | None


class TileBinning(NamedTuple):
    """Result of :func:`tile_candidates`.

    Attributes:
      candidates: (T, C + Cg) int32 Gaussian indices per tile, ``-1`` padded.
      n_tiles_x / n_tiles_y: tile grid dims (tile index = tx * nty + ty).
      local_overflow: scalar — candidate slots dropped because a tile
        exceeded C (the farthest Gaussians are dropped first).
      global_overflow: scalar —Aussians needing the global list beyond Cg.
      counts: (T,) int32 valid-prefix length per tile.
      chunk_lb: (T, W/chunk + 1) f32 — per candidate-chunk, a conservative
        lower bound on the entry depth t1 of EVERY candidate in this chunk
        or any later one (suffix min; +inf where the suffix is empty, 0.0
        in the trailing guard column and whenever no bound is available).
        The peel kernel stops its chunk sweep once all K winners are
        nearer than this bound (exact early termination). Only populated
        when ``chunk`` is given; ``None`` otherwise.
    """

    candidates: jnp.ndarray
    n_tiles_x: int
    n_tiles_y: int
    local_overflow: jnp.ndarray
    global_overflow: jnp.ndarray
    counts: jnp.ndarray
    chunk_lb: jnp.ndarray | None = None
    grad_plan: GradPlan | None = None


def _camera_space(points: jnp.ndarray, camera: Camera) -> jnp.ndarray:
    """World → camera coordinates: ``Rᵀ (p − pos)`` (camera looks −z)."""
    r = quat.as_rotation_mat3(camera.rotation)
    return (points - camera.position) @ r


def tile_candidates(
    g: G.Gaussians,
    camera: Camera,
    tile=(16, 16),
    max_candidates: int = 512,
    max_tiles_local=None,
    max_global: int = 128,
    pad_px: float = 0.0,
    narrow: int | None = None,
    chunk: int | None = None,
    grad_map: bool = False,
) -> TileBinning:
    """Build fixed-width per-tile candidate lists (all on-device, jittable).

    Within a tile, candidates are ordered by a quantized conservative lower
    bound on their ray entry depth t1 (center depth − √3·s_max — every hit
    point lies on the ``xᵀΣ⁻¹x = 3`` ellipsoid, whose bounding-sphere
    radius is √3·s_max, and a point's view depth never exceeds its ray
    parameter), so when a tile overflows ``max_candidates`` the farthest
    Gaussians drop first AND the peel kernel can stop its chunk sweep
    exactly once all K winners are nearer than the remaining candidates'
    bound (``chunk_lb``). The global list rides FIRST in each row so the
    depth-sorted local tail keeps tight suffix bounds.
    ``max_tiles_local`` defaults to ~128 px of screen coverage per axis;
    splats projecting wider than that go to the global list (nearest-first
    by the same bound — only when ``num_tiles < 2¹⁵``; beyond that the
    packed key drops the depth bits and drop order is arbitrary).

    ``narrow``: narrow-class fan-out width in tiles (default: env
    ``RTGS_BIN_NARROW`` or 4) — a STATIC argument so the jit cache keys on
    it (ADVICE r4: the env read alone silently ignored per-call changes).
    ``chunk``: when given, the candidate width is padded to a multiple of
    it and ``chunk_lb`` (see :class:`TileBinning`) is returned.

    Compile-bomb discipline (round 4, chipless per-primitive bisect at 1M
    splats): everything downstream of the fan-out is ONE ``lax.sort`` of
    the (tile, depth)-keyed pair stream — global-list pairs ride the same
    sort under a sentinel tile id — followed by scatter-add/gather
    placement. No O(pairs) scans (each compiled for 30 s-13 min at these
    sizes), no top_k over N (42 s), no 2-D scatter (22 s); the candidate
    matrix is a *gather* from the sorted stream (0.3 s).
    """
    w, h = camera.buf_size
    tw, th = tile
    ntx, nty = -(-w // tw), -(-h // th)
    num_tiles = ntx * nty
    if max_tiles_local is None:
        max_tiles_local = (min(max(2, -(-128 // tw)), ntx),
                           min(max(2, -(-128 // th)), nty))
    mtx, mty = max_tiles_local
    n = g.num

    # --- Project AABB corners. ---
    pmin, pmax = G.aabb(g.means, g.quats, g.scales)  # (N, 3) each
    lohi = jnp.stack([pmin, pmax], axis=1)  # (N, 2, 3)
    sel = jnp.array(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)])  # (8, 3)
    cx = lohi[:, sel[:, 0], 0]  # (N, 8)
    cy = lohi[:, sel[:, 1], 1]
    cz = lohi[:, sel[:, 2], 2]
    corners = jnp.stack([cx, cy, cz], axis=-1)  # (N, 8, 3)

    pc = _camera_space(corners.reshape(-1, 3), camera).reshape(n, 8, 3)
    z = pc[..., 2]
    eps = 1e-6
    behind = jnp.any(z > -eps, axis=-1)  # touches/behind the camera plane
    zsafe = jnp.minimum(z, -eps)
    fx, fy = camera.focal_length[0], camera.focal_length[1]
    # Pixel-center coordinates: pixel i's ray corresponds to px == i
    # (see camera.py:46-52 mapping).
    px = fx * pc[..., 0] / (-zsafe) + (w / 2 - 0.5)
    py = fy * pc[..., 1] / (-zsafe) + (h / 2 - 0.5)
    px_min, px_max = jnp.min(px, -1) - pad_px, jnp.max(px, -1) + pad_px
    py_min, py_max = jnp.min(py, -1) - pad_px, jnp.max(py, -1) + pad_px

    off_screen = (
        (px_max < -0.5) | (px_min > w - 0.5)
        | (py_max < -0.5) | (py_min > h - 0.5))
    live = (g.mask > 0) & (behind | ~off_screen)

    tx0 = jnp.clip(jnp.floor(px_min / tw), 0, ntx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(px_max / tw), 0, ntx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(py_min / th), 0, nty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(py_max / th), 0, nty - 1).astype(jnp.int32)
    wx, wy = tx1 - tx0 + 1, ty1 - ty0 + 1

    is_global = live & (behind | (wx > mtx) | (wy > mty))
    is_local = live & ~is_global

    # --- Entry-depth lower-bound quantization (in-tile sort key, drop
    # order, and the kernel's early-termination bound). ---
    depth = -_camera_space(g.means, camera)[:, 2]
    lb = jnp.maximum(
        depth - math.sqrt(G.BOUNDING_THRESHOLD)
        * jnp.max(g.scales, axis=-1), 0.0)
    dmax = jnp.maximum(jnp.max(jnp.where(live, lb, 0.0)), 1e-6)
    # Truncation rounds DOWN, so dequantized dq·dmax/65535 ≤ lb ≤ t1 —
    # the bound stays conservative. Clamp to 65534, not 65535: at
    # num_tiles == 32767 the packed key num_tiles·65536 + 65535 equals
    # INT32_MAX — the dead-slot sentinel — and the farthest live splat
    # always quantizes to the top bucket, so its global-list pair would
    # silently vanish (ADVICE r4).
    dq = jnp.clip(lb / dmax * 65535.0, 0, 65534).astype(jnp.int32)

    # --- Local fan-out, two classes (measured round 4): ≥99.3% of splats
    # at bench densities cover ≤ narrow×narrow tiles, so fanning every
    # splat out to the full (mtx, mty) rectangle wastes ~7x the pair
    # slots — and the flat O(N·mtx·mty) arrays were the 1M-scale compile
    # bomb (64M-element cumsums). Narrow splats fan out to narrow² slots;
    # the rare wide ones are compacted to a fixed budget first and fan
    # out to (mtx, mty); wide splats beyond the budget spill to the
    # GLOBAL list (conservative — appended to every tile), never dropped.
    # Narrow-class width (env RTGS_BIN_NARROW, default 4): at the
    # 1M@1080p bench pose 98.9% of splats fit 4×4 tiles but only 90.3%
    # fit 3×3 — with narrow = 3 the wide class (96.8k splats) overflowed
    # its n/16 budget and spilled 34k splats to the global list (0.55%
    # of candidates dropped in BENCH r4's first 1M run). At 4×4 the wide
    # class is 11k splats (5.7× headroom) at the cost of 16 instead of 9
    # fan-out slots per splat (~8% of frame time at 100k@384p — configs
    # whose overflow counters read zero at narrow = 3 can set the env).
    import os as _os

    if narrow is None:
        narrow = int(_os.environ.get("RTGS_BIN_NARROW", "4"))
    narrow = min(narrow, mtx, mty)
    is_wide = is_local & ((wx > narrow) | (wy > narrow))
    is_narrow = is_local & ~is_wide

    def fan_out(sel, tx0s, ty0s, wxs, wys, dqs, span_x, span_y):
        # Layout: (span, span, N) with the LONG axis minor — the (N, 3, 3)
        # form pads its minor dims onto the (8, 128) TPU tile, measured
        # 130x slower to build (scripts/binprobe2.py, round 5).
        dx = jnp.arange(span_x, dtype=jnp.int32)
        dy = jnp.arange(span_y, dtype=jnp.int32)
        txs = tx0s[None, :] + dx[:, None]              # (sx, L)
        tys = ty0s[None, :] + dy[:, None]              # (sy, L)
        tid = txs[:, None, :] * nty + tys[None, :, :]  # (sx, sy, L)
        ok = (sel[None, None, :]
              & (dx[:, None, None] < wxs[None, None, :])
              & (dy[None, :, None] < wys[None, None, :]))
        if num_tiles <= (1 << 15) - 1:
            key = jnp.where(ok, tid * 65536 + dqs[None, None, :],
                            _INT32_MAX)
        else:
            # Too many tiles for a packed int32 key: sort by tile only
            # (drop order becomes arbitrary within a tile).
            key = jnp.where(ok, tid, _INT32_MAX)
        return key.reshape(span_x * span_y, -1)

    shift = 65536 if num_tiles <= (1 << 15) - 1 else 1

    key_n = fan_out(is_narrow, tx0, ty0, wx, wy, dq, narrow, narrow)
    val_n = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :], key_n.shape)

    ids = jnp.arange(n, dtype=jnp.int32)
    if mtx > narrow or mty > narrow:
        # Compact wide splats to a budget, then full-rectangle fan-out.
        wlimit = max(64, n // 16)
        wpos = _tree_cumsum(is_wide.astype(jnp.int32)) - 1
        wdst = jnp.where(is_wide & (wpos < wlimit), wpos, wlimit)
        widx = jnp.full((wlimit + 1,), n, jnp.int32).at[wdst].set(
            ids, mode="drop")[:wlimit]
        wlive = widx < n
        wsafe = jnp.minimum(widx, n - 1)
        key_w = fan_out(wlive, tx0[wsafe], ty0[wsafe], wx[wsafe],
                        wy[wsafe], dq[wsafe], mtx, mty)
        val_w = jnp.broadcast_to(wsafe[None, :], key_w.shape)
        # Budget spill → global list (kept conservative, not dropped).
        is_global = is_global | (is_wide & (wpos >= wlimit))
        key_mid = [key_n.reshape(-1), key_w.reshape(-1)]
        val_mid = [val_n.reshape(-1), val_w.reshape(-1)]
    else:
        key_mid, val_mid = [key_n.reshape(-1)], [val_n.reshape(-1)]

    # --- Global-list pairs ride the SAME sort under a sentinel tile id
    # (num_tiles): depth-keyed like every other pair, so the global list
    # comes out nearest-first with no separate top_k over N. ---
    if num_tiles <= (1 << 15) - 1:
        key_g = jnp.where(is_global, num_tiles * 65536 + dq, _INT32_MAX)
    else:
        key_g = jnp.where(is_global, num_tiles, _INT32_MAX)
    key_f = jnp.concatenate(key_mid + [key_g])
    val_f = jnp.concatenate(val_mid + [ids])

    # One sort of the raw pair stream (dead slots carry INT32_MAX and sink
    # to the tail; with the two-class fan-out the stream is ~14 slots per
    # splat, so sorting it directly beats compacting first — the
    # compaction's own scans/scatters cost more compile time than the
    # slightly larger sort).
    if grad_map:
        # Carry each pair's PRE-SORT flat position through the sort so the
        # placement is invertible (the basis of the gather-form gradient
        # accumulation, :class:`GradPlan`).
        pos_f = jnp.arange(key_f.shape[0], dtype=jnp.int32)
        key_s, val_s, pos_s = jax.lax.sort((key_f, val_f, pos_f),
                                           num_keys=1)
    else:
        key_s, val_s = jax.lax.sort((key_f, val_f), num_keys=1)

    # Tile offsets by BINARY SEARCH on the sorted keys (tile t's pairs
    # span [offs[t], offs[t+1]) because the tile id rides the key's high
    # bits; dead pairs carry INT32_MAX and sink past the last boundary).
    # The scatter-add formulation this replaces measured 8.0 ms at 900k
    # pairs (scripts/binprobe2.py) — the search is ~20 gathers of T+2.
    # No overflow: num_tiles·shift ≤ (2¹⁵−1)·2¹⁶ < 2³¹ − 2¹⁶.
    bounds = jnp.concatenate([
        jnp.arange(num_tiles + 1, dtype=jnp.int32) * shift,
        jnp.asarray([_INT32_MAX], jnp.int32)])
    offs = jnp.searchsorted(key_s, bounds, side="left").astype(jnp.int32)
    tcounts = jnp.diff(offs)                     # (T+1,): locals + global

    # Candidate matrix as PER-TILE ROW SLICES of the sorted stream (each
    # tile's pairs are CONTIGUOUS there, so a vmapped dynamic_slice — an
    # XLA gather of whole rows — replaces the 1.6M-element scalar gather
    # that measured 11.5 ms, scripts/binprobe2.py). The global row's
    # pairs come FIRST in every tile's row (they carry no useful depth
    # ordering relative to the locals, and leading placement keeps the
    # local tail's suffix depth bounds tight for early termination), then
    # tile t's own pairs — valid indices form a contiguous prefix (the
    # kernel's chunk skipping keys off the count). Layout trick: build
    # [globals-right-aligned-in-mg | locals] rows and slice total_c
    # columns starting at mg − n_glob, which lands the globals exactly
    # ahead of the locals with one uniform dynamic column shift.
    cl = jnp.minimum(tcounts[:num_tiles], max_candidates)      # (T,)
    n_glob = jnp.minimum(tcounts[num_tiles], max_global)
    mg = max_global
    total_c = max_candidates + max_global
    if chunk:
        total_c += (-total_c) % chunk

    # Front/back-pad the stream so no slice start or extent ever clamps
    # (a clamped dynamic_slice silently shifts the window).
    val_sp = jnp.concatenate([jnp.full((mg,), -1, jnp.int32), val_s,
                              jnp.full((total_c,), -1, jnp.int32)])
    grow = jax.lax.dynamic_slice(val_sp, (offs[num_tiles] + n_glob,),
                                 (mg,))          # right-aligned globals
    lstarts = offs[:num_tiles] + mg
    lrows = jax.vmap(
        lambda o: jax.lax.dynamic_slice(val_sp, (o,), (total_c,)))(lstarts)
    combined = jnp.concatenate(
        [jnp.broadcast_to(grow[None, :], (num_tiles, mg)), lrows], axis=1)
    rows = jax.lax.dynamic_slice_in_dim(combined, mg - n_glob, total_c,
                                        axis=1)
    j = jnp.arange(total_c, dtype=jnp.int32)[None, :]          # (1, C+G)
    lj = j - n_glob
    ok = (j < n_glob) | ((lj >= 0) & (lj < cl[:, None]))
    candidates = jnp.where(ok, rows, -1)
    local_overflow = jnp.sum(
        jnp.maximum(tcounts[:num_tiles] - max_candidates, 0))
    global_overflow = jnp.maximum(tcounts[num_tiles] - max_global, 0)
    counts = cl + n_glob

    chunk_lb = None
    if chunk:
        # Per-chunk suffix-min entry-depth bound (see TileBinning), from
        # the same row slices applied to the sorted KEYS (low 16 bits =
        # quantized bound). Dead slots bound +inf (an empty suffix
        # terminates immediately). The many-tiles branch has no depth
        # bits — no bound, never stop.
        nchunk = total_c // chunk
        if shift == 65536:
            key_sp = jnp.concatenate(
                [jnp.full((mg,), _INT32_MAX, jnp.int32), key_s,
                 jnp.full((total_c,), _INT32_MAX, jnp.int32)])
            gkrow = jax.lax.dynamic_slice(
                key_sp, (offs[num_tiles] + n_glob,), (mg,))
            lkrows = jax.vmap(
                lambda o: jax.lax.dynamic_slice(key_sp, (o,),
                                                (total_c,)))(lstarts)
            kcomb = jnp.concatenate(
                [jnp.broadcast_to(gkrow[None, :], (num_tiles, mg)),
                 lkrows], axis=1)
            krows = jax.lax.dynamic_slice_in_dim(
                kcomb, mg - n_glob, total_c, axis=1)
            lb_slot = jnp.where(ok, (krows & 0xFFFF).astype(
                jnp.float32) * (dmax / 65535.0), jnp.inf)
            cmin = jnp.min(lb_slot.reshape(num_tiles, nchunk, chunk),
                           axis=2)
            chunk_lb = jax.lax.cummin(cmin, axis=1, reverse=True)
        else:
            chunk_lb = jnp.zeros((num_tiles, nchunk), jnp.float32)
        chunk_lb = jnp.concatenate(
            [chunk_lb, jnp.zeros((num_tiles, 1), jnp.float32)], axis=1)
    grad_plan = None
    if grad_map:
        # Map any pre-sort flat pair slot to its row in the backward's
        # flat value space [d_cand (T·C) | d_glob (C) | zero]: stream
        # position s = inv_s[slot]; tile segment by binary search on the
        # offsets; dead / overflow-dropped pairs → the zero row (their
        # candidates never entered the forward either). The global block
        # is a full-C tile-sum of d_cand (global candidates occupy the
        # same column j < n_glob in EVERY tile's row), so the backward
        # needs no static max_global.
        zero_row = (num_tiles + 1) * total_c
        cl_pad = jnp.concatenate([cl, jnp.zeros((1,), jnp.int32)])
        # d_cand row of every STREAM position, fully vectorized in stream
        # order — the pair's tile rides the key's high bits, its column
        # is the in-segment offset, dead pairs carry the sentinel key.
        # (Two rejected formulations, measured at 100k: a 1.4M-query
        # searchsorted cost ~95 ms; flat-order random gathers ~50 ms.)
        s_iota = jnp.arange(key_s.shape[0], dtype=jnp.int32)
        dead_s = key_s == _INT32_MAX
        t_s = jnp.minimum(key_s // shift, num_tiles)
        c_loc = s_iota - offs[t_s]
        is_loc = ~dead_s & (t_s < num_tiles) & (c_loc < cl_pad[t_s])
        is_glb = ~dead_s & (t_s == num_tiles) & (c_loc < n_glob)
        didx_s = jnp.where(
            is_loc, t_s * total_c + n_glob + c_loc,
            jnp.where(is_glb, num_tiles * total_c + c_loc,
                      zero_row)).astype(jnp.int32)
        # Undo the placement sort: keying by pre-sort position restores
        # FLAT fan-out order, where every block is a contiguous reshape —
        # slot j of splat i is row j·N + i, so no random access remains.
        _, plan_flat = jax.lax.sort((pos_s, didx_s), num_keys=1)

        nsl = narrow * narrow
        has_wide = mtx > narrow or mty > narrow
        wblock = mtx * mty * wlimit if has_wide else 0
        gather_idx = jnp.concatenate(
            [plan_flat[:nsl * n].reshape(nsl, n),
             plan_flat[nsl * n + wblock:].reshape(1, n)], axis=0)
        wide_idx = wide_ids = None
        if has_wide:
            wide_idx = plan_flat[nsl * n: nsl * n + wblock].reshape(
                mtx * mty, wlimit)
            wide_ids = jnp.where(wlive, wsafe, n)
        grad_plan = GradPlan(gather_idx, wide_idx, wide_ids)
    return TileBinning(candidates, ntx, nty, local_overflow, global_overflow,
                       counts, chunk_lb, grad_plan)
