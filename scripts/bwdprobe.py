"""Backward-pass decomposition on chip (round 5): the forward hit 17M
rays/s at 100k@384p but fwd+bwd sits at 1.8M — the step is ~90%
backward. Time each suspect in isolation:

  full      jax.grad through render_tiled_keys (the bench step)
  fixed-sel grad with binning + keys kernel outputs closed over as
            constants (isolates: shade fwd+bwd + feature-pack grad)
  shade     grad of shade_winners_kp + composite wrt PACKED only
            (isolates the custom VJP: re-gather + matmul cotangent +
            scatter-add)
  scatter   the scatter-add alone at the same (M, F) shape
  featpack  grad of pack_features(precompute_features(g)) alone

Usage: python scripts/bwdprobe.py [n] [w] [h]
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


_FLOOR = None


def _sync_floor():
    """Fresh-null-program sync floor (~30 ms/round on axon); a cached
    re-read floors at ~0 and under-corrects. See keystage._sync_floor."""
    null = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    _ = np.asarray(null(x))
    floors = []
    for _ in range(7):
        t0 = time.perf_counter()
        _ = np.asarray(null(x))
        floors.append(time.perf_counter() - t0)
    floors.sort()
    return floors[3]


def timeit(label, fn, readout, iters=5):
    global _FLOOR
    _ = np.asarray(readout(fn()))
    if _FLOOR is None:
        _FLOOR = _sync_floor()
        print(f"(sync floor {_FLOOR*1e3:.1f} ms)")
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(readout(fn()))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = max(ts[len(ts) // 2] - _FLOOR, 0.0)
    print(f"{label:12s} {dt*1e3:8.1f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=100_000)
    ap.add_argument("w", type=int, nargs="?", default=640)
    ap.add_argument("h", type=int, nargs="?", default=384)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--cand", type=int, default=1536)
    args = ap.parse_args()

    from rtgs_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from rtgs_tpu.camera import camera_from_fov
    from rtgs_tpu.ops.peel import CHUNK, peel_keys
    from rtgs_tpu.render.binning import tile_candidates
    from rtgs_tpu.render.tiled import (_tile_pixel_features,
                                       composite_layers_kp, pack_features,
                                       precompute_features,
                                       render_tiled_keys, shade_winners_kp)
    from rtgs_tpu.scene import random_scene
    from rtgs_tpu.viewer.orbit import orbit_camera_pose

    key = jax.random.PRNGKey(0)
    g = random_scene(key, args.n, extent=2.0, scale_range=(0.005, 0.03))
    jax.block_until_ready(g)
    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, (args.w, args.h), 60.0)
    kw = dict(depth=args.depth, tile=(16, 16),
              max_candidates=args.cand, max_global=128, bin_narrow=3)

    fwd = jax.jit(lambda gg: render_tiled_keys(gg, cam, **kw))
    timeit("fwd", lambda: fwd(g), lambda o: o[:1, 0])

    grad_full = jax.jit(jax.grad(lambda gg: jnp.sum(
        render_tiled_keys(gg, cam, **kw))))
    timeit("grad full", lambda: grad_full(g), lambda o: o.means[:1, 0])

    # --- fixed selection: binning + kernel as constants ---
    binning = jax.jit(lambda gg: tile_candidates(
        gg, cam, tile=(16, 16), max_candidates=args.cand, max_global=128,
        narrow=3, chunk=CHUNK))(g)
    cand = jax.lax.stop_gradient(binning.candidates)
    lb = jax.lax.stop_gradient(binning.chunk_lb)
    pix = _tile_pixel_features(cam, (16, 16))
    packed0 = jax.jit(lambda gg: pack_features(
        precompute_features(gg, cam)))(g)
    _t1k, sid_k = jax.jit(lambda p: peel_keys(p, cand, pix, args.depth,
                                              chunk_lb=lb))(packed0)
    sid_kp = jax.lax.stop_gradient(sid_k.transpose(0, 2, 1))

    def fixed_loss(gg):
        packed = pack_features(precompute_features(gg, cam))
        layers = shade_winners_kp(packed, sid_kp, pix)
        return jnp.sum(composite_layers_kp(*layers))

    grad_fixed = jax.jit(jax.grad(fixed_loss))
    timeit("grad fixedsel", lambda: grad_fixed(g), lambda o: o.means[:1, 0])

    def shade_loss(p):
        layers = shade_winners_kp(p, sid_kp, pix)
        return jnp.sum(composite_layers_kp(*layers))

    grad_shade = jax.jit(jax.grad(shade_loss))
    timeit("grad shade", lambda: grad_shade(packed0),
           lambda o: o[:1, 0])

    # production form: mask-matmul pre-reduction + head/tail segment_sum
    def shade_loss_cand(p):
        layers = shade_winners_kp(p, sid_kp, pix, cand)
        return jnp.sum(composite_layers_kp(*layers))

    grad_shade_c = jax.jit(jax.grad(shade_loss_cand))
    timeit("grad shade+cand", lambda: grad_shade_c(packed0),
           lambda o: o[:1, 0])

    # shade forward alone (so shade-bwd = grad_shade - this)
    shade_fwd = jax.jit(shade_loss)
    timeit("shade fwd", lambda: shade_fwd(packed0), lambda o: o[None])

    # scatter-add alone at the same shape
    t, k, p = sid_kp.shape
    m = t * k * p
    f = packed0.shape[1]
    safe = jnp.clip(jnp.where(jnp.isfinite(sid_kp), sid_kp, 0),
                    0, packed0.shape[0] - 1).astype(jnp.int32)
    rows = jnp.ones((m, f), jnp.float32)
    scat = jax.jit(lambda r: jnp.zeros_like(packed0).at[
        safe.reshape(-1)].add(r))
    timeit("scatter", lambda: scat(rows), lambda o: o[:1, 0])

    # feature pack grad alone
    gp = jax.jit(jax.grad(lambda gg: jnp.sum(
        pack_features(precompute_features(gg, cam)) ** 2)))
    timeit("featpack grad", lambda: gp(g), lambda o: o.means[:1, 0])

    # --- sub-stages of the production shade backward (round 5) ---
    c = cand.shape[1]
    hp = jax.lax.Precision.HIGHEST

    # d_rows assembly INPUT: fixed per-winner cotangents (values don't
    # matter for timing; shapes do).
    d_rows0 = jnp.ones((f, t, k, p), jnp.float32)

    onehot_einsum = jax.jit(lambda dr: jnp.einsum(
        "tcm,ftm->tcf",
        (cand[:, :, None] == safe.reshape(t, 1, k * p)).astype(jnp.float32),
        dr.reshape(f, t, k * p)))
    d_cand0 = onehot_einsum(d_rows0)
    timeit("onehot einsum", lambda: onehot_einsum(d_rows0),
           lambda o: o[:1, 0, 0])

    ids = jnp.where(cand >= 0, cand, packed0.shape[0] - 1)
    seg_full = jax.jit(lambda dc: jax.ops.segment_sum(
        dc.reshape(-1, f), ids.reshape(-1),
        num_segments=packed0.shape[0]))
    timeit("segsum full C", lambda: seg_full(d_cand0), lambda o: o[:1, 0])

    w_head = min(c, max(256, -(-(c // 4) // 128) * 128))
    seg_head = jax.jit(lambda dc: jax.ops.segment_sum(
        dc[:, :w_head, :].reshape(-1, f), ids[:, :w_head].reshape(-1),
        num_segments=packed0.shape[0]))
    timeit(f"segsum head {w_head}", lambda: seg_head(d_cand0),
           lambda o: o[:1, 0])

    tail_any = jax.jit(lambda dc: jnp.any(dc[:, w_head:, :] != 0.0))
    timeit("tail any-check", lambda: tail_any(d_cand0), lambda o: o[None])


if __name__ == "__main__":
    main()
