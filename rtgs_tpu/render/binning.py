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


_BLOCKED_SCAN_MIN = 1 << 22  # 4.2M — monolithic scans below this (XLA:TPU
# compile time for a single scan explodes with length; round-3 measured a
# 64M cumsum compiling >7 min vs 14 s for the two-level form. Round 4
# lowered the threshold from 33.5M: every config re-measures this round,
# so the old cache-parity constraint is gone, and the 1M configs must
# never see a multi-million-element monolithic scan).


def _blocked_scan(op, x, block: int = 8192):
    """Inclusive scan of a flat array via a two-level decomposition.

    XLA:TPU's compile time for a single monolithic scan explodes with
    length — ``jnp.cumsum`` over the 64M-slot pair array at 1M splats
    compiles for >7 minutes (measured chipless, round 3; a (7813, 8192)
    two-level scan compiles in 14s), which made every 1M-scene program
    un-compilable. Below the threshold the monolithic scan is kept — it is
    what the measured 100k/250k bench numbers compiled with.

    ``op`` must be associative with identity 0 w.r.t. the padding (holds
    for add, and for max over the non-negative values used here)."""
    n = x.shape[0]
    m = -(-n // block)
    pad = m * block - n
    xp = jnp.pad(x, (0, pad))
    rows = xp.reshape(m, block)
    inner = jax.lax.associative_scan(op, rows, axis=1)
    totals = inner[:, -1]
    offs = jax.lax.associative_scan(op, totals)
    offs = jnp.concatenate([totals[:1] * 0, offs[:-1]])
    out = op(inner, offs[:, None])
    return out.reshape(-1)[:n]


def _blocked_cumsum(x, block: int = 8192):
    return _blocked_scan(jnp.add, x, block)


class TileBinning(NamedTuple):
    """Result of :func:`tile_candidates`.

    Attributes:
      candidates: (T, C + Cg) int32 Gaussian indices per tile, ``-1`` padded.
      n_tiles_x / n_tiles_y: tile grid dims (tile index = tx * nty + ty).
      local_overflow: scalar — candidate slots dropped because a tile
        exceeded C (the farthest Gaussians are dropped first).
      global_overflow: scalar —Aussians needing the global list beyond Cg.
    """

    candidates: jnp.ndarray
    n_tiles_x: int
    n_tiles_y: int
    local_overflow: jnp.ndarray
    global_overflow: jnp.ndarray
    counts: jnp.ndarray


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
    pairs_budget: int | None = None,
    pad_px: float = 0.0,
) -> TileBinning:
    """Build fixed-width per-tile candidate lists (all on-device, jittable).

    Within a tile, candidates are ordered by quantized center depth, so when
    a tile overflows ``max_candidates`` the *farthest* Gaussians drop first.
    ``max_tiles_local`` defaults to ~128 px of screen coverage per axis;
    splats projecting wider than that go to the global list (nearest-first).

    ``pairs_budget`` bounds the compacted (tile, splat) pair buffer that
    feeds the sort. The raw fan-out is N × mtx·mty slots but almost all are
    dead (a typical splat covers 1-4 tiles), so live pairs are compacted by
    prefix-sum + scatter first and only the budget is sorted — at 1M splats
    this shrinks the sort from 64M keys to the budget (default 8N). Pairs
    beyond the budget are dropped (highest splat indices first) and counted
    in ``local_overflow``.
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

    # --- Depth quantization (drop-order inside a tile). ---
    depth = -_camera_space(g.means, camera)[:, 2]
    dmax = jnp.maximum(jnp.max(jnp.where(live, depth, 0.0)), 1e-6)
    dq = jnp.clip(depth / dmax * 65535.0, 0, 65535).astype(jnp.int32)

    # --- Local fan-out, two classes (measured round 4): ≥99.3% of splats
    # at bench densities cover ≤ narrow×narrow tiles, so fanning every
    # splat out to the full (mtx, mty) rectangle wastes ~7x the pair
    # slots — and the flat O(N·mtx·mty) arrays were the 1M-scale compile
    # bomb (64M-element cumsums). Narrow splats fan out to narrow² slots;
    # the rare wide ones are compacted to a fixed budget first and fan
    # out to (mtx, mty); wide splats beyond the budget spill to the
    # GLOBAL list (conservative — appended to every tile), never dropped.
    narrow = min(3, mtx, mty)
    is_wide = is_local & ((wx > narrow) | (wy > narrow))
    is_narrow = is_local & ~is_wide

    def fan_out(sel, tx0s, ty0s, wxs, wys, dqs, span_x, span_y):
        dx = jnp.arange(span_x, dtype=jnp.int32)
        dy = jnp.arange(span_y, dtype=jnp.int32)
        txs = tx0s[:, None] + dx[None, :]
        tys = ty0s[:, None] + dy[None, :]
        tid = txs[:, :, None] * nty + tys[:, None, :]
        ok = (sel[:, None, None]
              & (dx[None, :, None] < wxs[:, None, None])
              & (dy[None, None, :] < wys[:, None, None]))
        m = span_x * span_y
        tid, ok = tid.reshape(-1, m), ok.reshape(-1, m)
        if num_tiles <= (1 << 15) - 1:
            key = jnp.where(ok, tid * 65536 + dqs[:, None], _INT32_MAX)
        else:
            # Too many tiles for a packed int32 key: sort by tile only
            # (drop order becomes arbitrary within a tile).
            key = jnp.where(ok, tid, _INT32_MAX)
        return key

    shift = 65536 if num_tiles <= (1 << 15) - 1 else 1

    key_n = fan_out(is_narrow, tx0, ty0, wx, wy, dq, narrow, narrow)
    val_n = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], key_n.shape)

    if mtx > narrow or mty > narrow:
        # Compact wide splats to a budget, then full-rectangle fan-out.
        wlimit = max(64, n // 16)
        wpos = jnp.cumsum(is_wide.astype(jnp.int32)) - 1
        wdst = jnp.where(is_wide & (wpos < wlimit), wpos, wlimit)
        widx = jnp.full((wlimit + 1,), n, jnp.int32).at[wdst].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")[:wlimit]
        wlive = widx < n
        wsafe = jnp.minimum(widx, n - 1)
        key_w = fan_out(wlive, tx0[wsafe], ty0[wsafe], wx[wsafe],
                        wy[wsafe], dq[wsafe], mtx, mty)
        val_w = jnp.broadcast_to(wsafe[:, None], key_w.shape)
        # Budget spill → global list (kept conservative, not dropped).
        is_global = is_global | (is_wide & (wpos >= wlimit))
        key_f = jnp.concatenate([key_n.reshape(-1), key_w.reshape(-1)])
        val_f = jnp.concatenate([val_n.reshape(-1), val_w.reshape(-1)])
    else:
        key_f, val_f = key_n.reshape(-1), val_n.reshape(-1)

    # --- Compact live pairs before sorting (prefix-sum stream compaction,
    # the XLA idiom replacing the reference's atomic counters,
    # scene.py:267-270). ---
    if pairs_budget is None:
        pairs_budget = min(8 * n, key_f.shape[0])
    pairs_budget = min(pairs_budget, key_f.shape[0])
    pair_live_f = key_f != _INT32_MAX
    flat = pair_live_f.shape[0]
    if flat < _BLOCKED_SCAN_MIN:
        # The EXACT expression the measured bench configs compiled with —
        # keeping it verbatim preserves compilation-cache hits (the driver
        # re-runs the bench; a wedged remote compiler must not force a
        # recompile of the proven configs).
        pos = jnp.cumsum(pair_live_f.astype(jnp.int32)) - 1
    else:
        pos = _blocked_cumsum(pair_live_f.astype(jnp.int32)) - 1
    budget_overflow = jnp.maximum(
        jnp.sum(pair_live_f.astype(jnp.int32)) - pairs_budget, 0)
    dst = jnp.where(pair_live_f, pos, pairs_budget)  # dead/over → dropped
    key_c = jnp.full((pairs_budget,), _INT32_MAX, jnp.int32
                     ).at[dst].set(key_f, mode="drop")
    val_c = jnp.full((pairs_budget,), -1, jnp.int32
                     ).at[dst].set(val_f, mode="drop")
    key_s, val_s = jax.lax.sort((key_c, val_c), num_keys=1)

    total = key_s.shape[0]
    iota = jnp.arange(total, dtype=jnp.int32)
    tile_of = jnp.where(key_s == _INT32_MAX, num_tiles, key_s // shift)
    # Rank within tile WITHOUT an O(pairs) scan. The segment-start
    # max-scan used through round 3 was the measured 1M-scale compile
    # bomb (>13 min of XLA:TPU compile at 8M pairs, chipless bisect,
    # round 4); since pairs are sorted by tile, the segment start is just
    # the count of pairs in earlier tiles: one scatter-add into the TILE
    # axis (num_tiles + 1 slots — dead pairs land in the sentinel row), a
    # cumsum over tiles, and a gather back per pair.
    tcounts = jnp.zeros((num_tiles + 1,), jnp.int32).at[tile_of].add(
        1, mode="drop")
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tcounts)[:-1]])
    slot = iota - offs[tile_of]

    pair_live = key_s != _INT32_MAX
    cands = jnp.full((num_tiles, max_candidates), -1, jnp.int32)
    cands = cands.at[
        jnp.where(pair_live, tile_of, num_tiles),
        slot,
    ].set(val_s, mode="drop")
    local_overflow = (jnp.sum(pair_live & (slot >= max_candidates))
                      + budget_overflow)

    # --- Global list: nearest-first, appended to every tile directly after
    # its local candidates so valid indices form a contiguous prefix (the
    # Pallas kernel's chunk skipping keys off the per-tile count). ---
    gscore = jnp.where(is_global, -depth, -jnp.inf)
    k_glob = min(max_global, n)  # shards can be smaller than the budget
    gvals, gidx = jax.lax.top_k(gscore, k_glob)
    if k_glob < max_global:
        gvals = jnp.pad(gvals, (0, max_global - k_glob),
                        constant_values=-jnp.inf)
        gidx = jnp.pad(gidx, (0, max_global - k_glob))
    glob = jnp.where(gvals > -jnp.inf, gidx.astype(jnp.int32), -1)
    n_glob = jnp.sum(glob >= 0).astype(jnp.int32)
    global_overflow = jnp.maximum(
        jnp.sum(is_global) - max_global, 0)

    total_c = max_candidates + max_global
    count_local = jnp.sum(cands >= 0, axis=1).astype(jnp.int32)  # (T,)
    candidates = jnp.concatenate(
        [cands, jnp.full((num_tiles, max_global), -1, jnp.int32)], axis=1)
    if max_global > 0:
        gcol = count_local[:, None] + jnp.arange(max_global,
                                                 dtype=jnp.int32)[None, :]
        gcol = jnp.where(glob[None, :] >= 0, gcol, total_c)  # drop invalid
        grow = jnp.broadcast_to(
            jnp.arange(num_tiles, dtype=jnp.int32)[:, None],
            (num_tiles, max_global))
        candidates = candidates.at[grow, gcol].set(
            jnp.broadcast_to(glob[None, :], (num_tiles, max_global)),
            mode="drop")
    counts = count_local + n_glob
    return TileBinning(candidates, ntx, nty, local_overflow, global_overflow,
                       counts)
