"""Keys-only render path (round 4): the fused kernel selects per-pixel
winner (t1, splat id) keys; XLA shades + composites the winners and
provides the backward by autodiff (rtgs_tpu/ops/peel.py:_keys_sid_kernel,
rtgs_tpu/render/tiled.py:shade_winners_kp). Must match the fused-payload
Pallas path and the XLA tiled path exactly (same selection order, same
math, different execution)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtgs_tpu.camera import camera_from_fov
from rtgs_tpu.render.oracle import render_oracle
from rtgs_tpu.render.tiled import (render_tiled, render_tiled_keys,
                                   render_tiled_pallas)
from rtgs_tpu.scene import random_scene
from rtgs_tpu.viewer.orbit import orbit_camera_pose


def _orbit_cam(res, theta=0.3, phi=1.2, r=3.0, fov=60.0):
    pos, rot, _, _ = orbit_camera_pose(
        theta, phi, r, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    return camera_from_fov(pos, rot, res, fov)


def test_keys_matches_oracle(key):
    from tests._utils import assert_images_close

    g = random_scene(key, 600, extent=1.0)
    cam = _orbit_cam((64, 48))
    img_k = render_tiled_keys(g, cam, depth=16, tile=(16, 16),
                              max_candidates=640, max_global=64)
    img_o = render_oracle(g, cam, depth=16)
    assert_images_close(np.asarray(img_k), np.asarray(img_o))


def test_keys_matches_pallas_path(key):
    """Same selection (argmin tie-break to lower slot) as the fused kernel
    — the two production paths must agree tightly."""
    g = random_scene(key, 400, extent=1.0)
    cam = _orbit_cam((48, 32))
    kw = dict(depth=8, tile=(16, 16), max_candidates=512, max_global=32)
    img_k = np.asarray(render_tiled_keys(g, cam, **kw))
    img_p = np.asarray(render_tiled_pallas(g, cam, **kw))
    assert np.isfinite(img_k).all()
    # Same selection; the shading arithmetic differs in summation order
    # (unrolled fused multiply-adds vs MXU dot), which the cancellation-
    # sensitive exp(B²/4A − eᵀMe) amplifies to the usual ~1e-4 bulk scale
    # (see tests/_utils.py) — the standard image tolerance applies.
    from tests._utils import assert_images_close

    assert_images_close(img_k, img_p)


def test_keys_bands_identical(key):
    g = random_scene(key, 300, extent=1.0)
    cam = _orbit_cam((64, 48))
    kw = dict(depth=8, tile=(16, 16), max_candidates=384, max_global=32)
    a = np.asarray(render_tiled_keys(g, cam, **kw))
    b = np.asarray(render_tiled_keys(g, cam, tile_bands=3, **kw))
    assert np.array_equal(a, b) or np.abs(a - b).max() < 1e-6


def test_keys_kernel_interpret_matches_xla(key):
    """The Pallas keys kernel (interpret mode) against the lax.top_k
    formulation: identical keys incl. vacancy and tie order."""
    from rtgs_tpu.ops.peel import (CHUNK, peel_keys_pallas, peel_keys_xla)
    from rtgs_tpu.render.binning import tile_candidates
    from rtgs_tpu.render.tiled import (_tile_pixel_features, pack_features,
                                       precompute_features)

    g = random_scene(key, 300, extent=1.0)
    # Duplicate a few splats so exact t1 ties exist.
    g = jax.tree.map(
        lambda x: jnp.concatenate([x, x[:32]], axis=0), g)
    cam = _orbit_cam((32, 32))
    binning = tile_candidates(g, cam, tile=(16, 16), max_candidates=384,
                              max_global=32)
    cand = binning.candidates
    pad_c = (-cand.shape[1]) % CHUNK
    cand = jnp.pad(cand, ((0, 0), (0, pad_c)), constant_values=-1)
    packed = pack_features(precompute_features(g, cam))
    pix = _tile_pixel_features(cam, (16, 16))
    t1_p, s_p = peel_keys_pallas(packed, cand, pix, 8)
    t1_x, s_x = peel_keys_xla(packed, cand, pix, 8)
    # Slots (the actual selection, incl. tie order and vacancies) must be
    # IDENTICAL; t1 may differ in final bits (the interpreter evaluates
    # dot_general per block, the XLA path over the full array).
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_x))
    a, b = np.asarray(t1_p), np.asarray(t1_x)
    fin = np.isfinite(a)
    assert (fin == np.isfinite(b)).all()
    np.testing.assert_allclose(a[fin], b[fin], rtol=1e-5)


def test_keys_gradients_match_tiled(key):
    """Autodiff through shade_winners must equal autodiff through the
    all-candidates tiled path (identical selection ⇒ identical piecewise-
    smooth function)."""
    g = random_scene(key, 200, extent=1.0)
    cam = _orbit_cam((32, 32))
    kw = dict(depth=8, tile=(16, 16), max_candidates=256, max_global=32)

    def loss_keys(gg):
        return jnp.sum(render_tiled_keys(gg, cam, **kw) ** 2)

    def loss_tiled(gg):
        return jnp.sum(render_tiled(gg, cam, **kw) ** 2)

    gk = jax.grad(loss_keys)(g)
    gt = jax.grad(loss_tiled)(g)
    # Same normalized-quantile tolerance as the cross-implementation grad
    # tests (test_parallel.py): the two paths accumulate per-candidate
    # contributions in different orders (scatter-add of winners vs matmul
    # over candidates), and a grazing-incidence winner can flip validity
    # between the elementwise and matmul quadratic evaluations.
    for name in ["means", "quats", "scales", "colors", "opacities", "sh"]:
        a = np.asarray(getattr(gk, name))
        b = np.asarray(getattr(gt, name))
        assert np.isfinite(a).all(), name
        rel = np.abs(a - b) / (np.abs(b).max() + 1e-8)
        assert np.quantile(rel, 0.99) < 5e-3, (name, np.quantile(rel, 0.99))
        assert rel.max() < 5e-2, (name, rel.max())


def test_keys_with_stats(key):
    g = random_scene(key, 200, extent=1.0)
    cam = _orbit_cam((32, 32))
    img, stats = render_tiled_keys(g, cam, depth=8, max_candidates=256,
                                   max_global=32, with_stats=True)
    assert int(stats["local_overflow"]) == 0
    assert img.shape == (32, 32, 3)


def test_keys_shade_layouts_agree(key):
    """(T,K,P)-layout shading must equal the (T,P,K) form bitwise-ish."""
    g = random_scene(key, 300, extent=1.0)
    cam = _orbit_cam((48, 32))
    kw = dict(depth=8, tile=(16, 16), max_candidates=384, max_global=32)
    a = np.asarray(render_tiled_keys(g, cam, shade_layout="pk", **kw))
    b = np.asarray(render_tiled_keys(g, cam, shade_layout="kp", **kw))
    # Identical selection; summation order differs (lane reduce vs
    # unrolled), exp-amplified through the quadratic — standard image
    # tolerance (see test_keys_matches_pallas_path).
    from tests._utils import assert_images_close

    assert_images_close(a, b)


def test_early_termination_exact(key):
    """The chunk-bound early termination (round 5) must be EXACT: the
    Pallas kernel fed ``chunk_lb`` returns bitwise-identical keys to the
    bound-free full sweep, and the bound itself must be sound — every
    candidate in chunk c or later has t1 >= chunk_lb[c]."""
    from rtgs_tpu.ops.peel import (CHUNK, peel_keys_pallas, _gather,
                                   _intersect_t1)
    from rtgs_tpu.render.binning import tile_candidates
    from rtgs_tpu.render.tiled import (_tile_pixel_features, pack_features,
                                       precompute_features)

    # Deep scene: enough splats per tile that several chunks exist.
    g = random_scene(key, 3000, extent=0.6, scale_range=(0.01, 0.06))
    cam = _orbit_cam((32, 32), r=2.0)
    binning = tile_candidates(g, cam, tile=(16, 16), max_candidates=1024,
                              max_global=64, chunk=CHUNK)
    cand = binning.candidates
    assert cand.shape[1] % CHUNK == 0
    lb = binning.chunk_lb
    assert lb is not None and lb.shape == (cand.shape[0],
                                           cand.shape[1] // CHUNK + 1)
    # Need multi-chunk tiles for the test to mean anything.
    assert int(jnp.max(jnp.sum(cand >= 0, axis=1))) > CHUNK

    packed = pack_features(precompute_features(g, cam))
    pix = _tile_pixel_features(cam, (16, 16))

    # Soundness: t1 of every candidate >= the suffix bound of its chunk.
    gathered, _ = _gather(packed, cand)
    t1, *_ = _intersect_t1(gathered, pix)            # (T, P, C)
    t1 = np.asarray(jnp.min(t1, axis=1))             # (T, C) min over pixels
    lb_np = np.asarray(lb)
    nch = cand.shape[1] // CHUNK
    for c in range(nch):
        suffix = t1[:, c * CHUNK:]
        viol = suffix < lb_np[:, c:c + 1] - 1e-5
        assert not viol.any(), f"chunk {c}: bound violated"

    t1_full, sid_full = peel_keys_pallas(packed, cand, pix, 8,
                                         chunk_lb=None)
    t1_et, sid_et = peel_keys_pallas(packed, cand, pix, 8, chunk_lb=lb)
    np.testing.assert_array_equal(np.asarray(sid_full), np.asarray(sid_et))
    np.testing.assert_array_equal(np.asarray(t1_full), np.asarray(t1_et))


def test_keys_grad_through_pallas_impl(key):
    """Regression (round 5): jax.grad through the PALLAS keys kernel.

    The early-termination bounds (``chunk_lb``) derive from the scene via
    the binning, so without a stop_gradient they drag a JVP into the
    non-differentiable ``pallas_call`` (NotImplementedError — seen first
    on chip, where ``keys_impl='auto'`` picks Pallas while every CPU test
    picked the XLA twin). Forcing ``keys_impl='pallas'`` (interpret mode
    on CPU) makes the suite cover the chip dispatch path; selection is
    identical so the gradient must match the XLA-impl gradient exactly up
    to accumulation order."""
    g = random_scene(key, 200, extent=1.0)
    cam = _orbit_cam((32, 32))
    kw = dict(depth=8, tile=(16, 16), max_candidates=256, max_global=32)

    def loss(impl):
        def f(gg):
            return jnp.sum(render_tiled_keys(
                gg, cam, keys_impl=impl, **kw) ** 2)
        return f

    gp = jax.grad(loss("pallas"))(g)
    gx = jax.grad(loss("xla"))(g)
    for name in ["means", "quats", "scales", "colors", "opacities", "sh"]:
        a = np.asarray(getattr(gp, name))
        b = np.asarray(getattr(gx, name))
        assert np.isfinite(a).all(), name
        rel = np.abs(a - b) / (np.abs(b).max() + 1e-8)
        assert rel.max() < 1e-4, (name, rel.max())


def test_grad_plan_matches_segment_sum(key):
    """The gather-form gradient accumulation (GradPlan: mask-matmul +
    per-splat gather) must equal the segment_sum form (grad_map=False,
    the banded/sharded fallback) — same d_cand, different placement of
    the final per-splat reduction."""
    g = random_scene(key, 400, extent=0.8, scale_range=(0.01, 0.06))
    cam = _orbit_cam((32, 32))
    kw = dict(depth=8, tile=(16, 16), max_candidates=256, max_global=32)

    def loss(gm):
        def f(gg):
            return jnp.sum(render_tiled_keys(
                gg, cam, grad_map=gm, **kw) ** 2)
        return f

    gp = jax.grad(loss(True))(g)
    gs = jax.grad(loss(False))(g)
    for name in ["means", "quats", "scales", "colors", "opacities", "sh"]:
        a = np.asarray(getattr(gp, name))
        b = np.asarray(getattr(gs, name))
        assert np.isfinite(a).all(), name
        rel = np.abs(a - b) / (np.abs(b).max() + 1e-8)
        assert rel.max() < 1e-5, (name, rel.max())


def test_grad_plan_wide_class(key):
    """GradPlan with wide-class splats in play: big scales force the
    wide fan-out (and the global list), exercising wide_idx/wide_ids."""
    g = random_scene(key, 300, extent=0.5, scale_range=(0.02, 0.35))
    cam = _orbit_cam((48, 32), r=2.0)
    kw = dict(depth=8, tile=(16, 16), max_candidates=512, max_global=64,
              bin_narrow=2)

    def loss(gm):
        def f(gg):
            return jnp.sum(render_tiled_keys(
                gg, cam, grad_map=gm, **kw) ** 2)
        return f

    gp = jax.grad(loss(True))(g)
    gs = jax.grad(loss(False))(g)
    for name in ["means", "scales", "colors"]:
        a = np.asarray(getattr(gp, name))
        b = np.asarray(getattr(gs, name))
        assert np.isfinite(a).all(), name
        rel = np.abs(a - b) / (np.abs(b).max() + 1e-8)
        assert rel.max() < 1e-5, (name, rel.max())


def test_banded_gradients_match_unbanded(key):
    """jax.grad through the BANDED path (lax.map + jax.checkpoint remat +
    the segment_sum backward — the 1M@1080p program family) must match
    the unbanded gradient: banding partitions tiles, nothing else."""
    g = random_scene(key, 400, extent=0.8, scale_range=(0.01, 0.06))
    cam = _orbit_cam((48, 48))
    kw = dict(depth=8, tile=(16, 16), max_candidates=256, max_global=32)

    def loss(bands):
        def f(gg):
            return jnp.sum(render_tiled_keys(
                gg, cam, tile_bands=bands, **kw) ** 2)
        return f

    gb = jax.grad(loss(3))(g)
    gu = jax.grad(loss(None))(g)
    # Not exact: per-band segment_sums accumulate partial per-splat sums
    # that the unbanded path adds in one pass — a floating-point
    # reassociation, amplified where a splat's contributions nearly
    # cancel (quats). Same normalized-quantile tolerance as the other
    # cross-implementation gradient tests.
    for name in ["means", "quats", "scales", "colors", "opacities", "sh"]:
        a = np.asarray(getattr(gb, name))
        b = np.asarray(getattr(gu, name))
        assert np.isfinite(a).all(), name
        rel = np.abs(a - b) / (np.abs(b).max() + 1e-8)
        assert np.quantile(rel, 0.99) < 5e-4, (name, np.quantile(rel, 0.99))
        assert rel.max() < 5e-3, (name, rel.max())
