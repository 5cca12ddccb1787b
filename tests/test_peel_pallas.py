"""Pallas fused peel kernel tests (interpret mode on CPU):

  1. kernel forward == pure-XLA execution of the same math,
  2. hand-derived backward == JAX autodiff of that XLA reference,
  3. full pallas renderer == tiled XLA renderer (statistical, grazing
     caveat as usual) and == oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rtgs_tpu.ops.peel import peel_pallas, peel_reference
from rtgs_tpu.render.binning import tile_candidates
from rtgs_tpu.render.oracle import render_oracle
from rtgs_tpu.render.tiled import (
    _tile_pixel_features,
    pack_features,
    precompute_features,
    render_tiled,
    render_tiled_pallas,
)
from rtgs_tpu.scene import random_scene
from tests._utils import assert_images_close
from tests.test_tiled import _orbit_cam


def _setup(key, n=150, res=(32, 16), tile=(16, 8), cmax=128, gmax=0):
    g = random_scene(key, n, extent=1.0)
    cam = _orbit_cam(res)
    binning = tile_candidates(g, cam, tile=tile, max_candidates=cmax,
                              max_global=max(gmax, 1))
    cand = binning.candidates
    pad_c = (-cand.shape[1]) % 128
    if pad_c:
        cand = jnp.pad(cand, ((0, 0), (0, pad_c)), constant_values=-1)
    packed = pack_features(precompute_features(g, cam))
    pix = _tile_pixel_features(cam, tile)
    return g, cam, packed, cand, pix


def test_pallas_forward_matches_reference(key):
    _, _, packed, cand, pix = _setup(key)
    rad_p, trans_p = peel_pallas(packed, cand, pix, 8)
    rad_r, trans_r = peel_reference(packed, cand, pix, 8)
    np.testing.assert_allclose(np.asarray(rad_p), np.asarray(rad_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(trans_p), np.asarray(trans_r),
                               atol=1e-5)


def test_pallas_backward_matches_autodiff(key):
    """The hand-derived division-free backward == autodiff of the identical
    XLA math. This is exact (same selections, same arithmetic), no grazing
    caveat needed."""
    _, _, packed, cand, pix = _setup(key, n=80, res=(16, 16), tile=(8, 8))
    kr = jax.random.fold_in(key, 7)
    # Random cotangents on both outputs.
    t_tiles, p, _ = pix.shape

    def loss_pallas(packed):
        rad, trans = peel_pallas(packed, cand, pix, 8)
        return jnp.sum(rad * wr) + jnp.sum(trans * wt)

    def loss_ref(packed):
        rad, trans = peel_reference(packed, cand, pix, 8)
        return jnp.sum(rad * wr) + jnp.sum(trans * wt)

    wr = jax.random.normal(kr, (t_tiles, 3, p))
    wt = jax.random.normal(jax.random.fold_in(kr, 1), (t_tiles, p))

    g_pallas = jax.grad(loss_pallas)(packed)
    g_ref = jax.grad(loss_ref)(packed)
    a, b = np.asarray(g_pallas), np.asarray(g_ref)
    scale = np.abs(b).max() + 1e-8
    np.testing.assert_allclose(a / scale, b / scale, atol=2e-5)


def test_pallas_renderer_matches_tiled(key):
    g = random_scene(key, 300, extent=1.0)
    cam = _orbit_cam((32, 24))
    img_x = np.asarray(render_tiled(
        g, cam, depth=8, tile=(16, 8), max_candidates=256, max_global=32))
    img_p = np.asarray(render_tiled_pallas(
        g, cam, depth=8, tile=(16, 8), max_candidates=256, max_global=32))
    assert_images_close(img_p, img_x)


def test_pallas_renderer_matches_oracle(key):
    g = random_scene(key, 200, extent=0.8)
    cam = _orbit_cam((32, 16))
    img_o = np.asarray(render_oracle(g, cam, depth=16))
    img_p = np.asarray(render_tiled_pallas(
        g, cam, depth=16, tile=(16, 8), max_candidates=256, max_global=32))
    assert_images_close(img_p, img_o)


def test_pallas_scene_gradients(key):
    """End-to-end scene-parameter gradients through binning → packing →
    kernel → scatter: match the XLA tiled renderer's autodiff grads."""
    g = random_scene(key, 60, extent=0.8)
    cam = _orbit_cam((16, 16))

    def loss_pallas(g):
        return jnp.sum(render_tiled_pallas(
            g, cam, depth=8, tile=(8, 8), max_candidates=128,
            max_global=16) ** 2)

    def loss_tiled(g):
        return jnp.sum(render_tiled(
            g, cam, depth=8, tile=(8, 8), max_candidates=128,
            max_global=16) ** 2)

    gp = jax.grad(loss_pallas)(g)
    gt = jax.grad(loss_tiled)(g)
    for name in ["means", "quats", "scales", "colors", "opacities", "sh"]:
        a, b = np.asarray(getattr(gp, name)), np.asarray(getattr(gt, name))
        assert np.isfinite(a).all(), name
        scale = np.abs(b).max() + 1e-8
        rel = np.abs(a - b) / scale
        assert np.quantile(rel, 0.99) < 1e-3, name
        assert rel.max() < 0.2, name


def test_pallas_topk_forward_and_backward(key):
    """peel_topk_pallas: K-list forward equals XLA-composited peel when
    composited outside; hand backward equals autodiff of the same
    composite-of-K-lists formulation."""
    from rtgs_tpu.ops.peel import peel_topk_pallas
    from rtgs_tpu.render.oracle import composite_hits

    _, _, packed, cand, pix = _setup(key, n=80, res=(16, 16), tile=(8, 8))
    depth = 8

    def via_topk(packed):
        t1, a, r, g, b = peel_topk_pallas(packed, cand, pix, depth)
        rgb = jnp.stack([r, g, b], axis=-1)
        rad, trans = composite_hits(t1, a, rgb)
        return rad, trans

    def via_reference(packed):
        rad, trans = peel_reference(packed, cand, pix, depth)
        return rad.transpose(0, 2, 1), trans  # (T, P, 3)

    rad_t, trans_t = via_topk(packed)
    rad_r, trans_r = via_reference(packed)
    np.testing.assert_allclose(np.asarray(rad_t), np.asarray(rad_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(trans_t), np.asarray(trans_r),
                               atol=1e-5)

    kr = jax.random.fold_in(key, 3)
    w = jax.random.normal(kr, rad_t.shape)

    def loss_topk(p):
        rad, trans = via_topk(p)
        return jnp.sum(w * rad) + jnp.sum(trans)

    def loss_ref(p):
        rad, trans = via_reference(p)
        return jnp.sum(w * rad) + jnp.sum(trans)

    g_t = jax.grad(loss_topk)(packed)
    g_r = jax.grad(loss_ref)(packed)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_r),
                               rtol=1e-4, atol=1e-5)
