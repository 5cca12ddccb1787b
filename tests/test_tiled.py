"""Tiled renderer vs oracle: the acceleration structure must be lossless
(conservative binning ⇒ identical images up to f32 reassociation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtgs_tpu import gaussians as G
from rtgs_tpu.camera import camera_from_fov, new_camera
from rtgs_tpu.render.binning import tile_candidates
from rtgs_tpu.render.oracle import render_oracle
from rtgs_tpu.render.tiled import render_tiled
from rtgs_tpu.scene import random_scene
from rtgs_tpu.viewer.orbit import orbit_camera_pose


def _orbit_cam(res, theta=0.3, phi=1.2, r=3.0, fov=60.0):
    pos, rot, _, _ = orbit_camera_pose(
        theta, phi, r, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    return camera_from_fov(pos, rot, res, fov)


def test_binning_covers_all_hitting_gaussians(key):
    """Every Gaussian whose ellipsoid a pixel ray actually hits must appear
    in that pixel's tile candidate list (soundness of the acceleration
    structure — the property the reference's BVH gets from conservative
    AABBs, scene.py:406-450)."""
    g = random_scene(key, 300, extent=1.0)
    cam = _orbit_cam((64, 32))
    tw, th = 16, 8
    binning = tile_candidates(g, cam, tile=(tw, th), max_candidates=300,
                              max_global=32)
    assert int(binning.local_overflow) == 0
    assert int(binning.global_overflow) == 0

    from rtgs_tpu.camera import generate_ray_grid

    rays = generate_ray_grid(cam)
    cov_inv = G.inv_covariance(g.quats, g.scales)
    t1, _ = G.hit(cov_inv, g.means, rays.origins[..., None, :],
                  rays.directions[..., None, :])  # (W, H, N)
    hits = np.asarray((t1 > 0) & jnp.isfinite(t1))
    cands = np.asarray(binning.candidates)
    ntx, nty = binning.n_tiles_x, binning.n_tiles_y
    w, h = cam.buf_size
    missing = 0
    for x in range(w):
        for y in range(h):
            tile_id = (x // tw) * nty + (y // th)
            cand_set = set(cands[tile_id][cands[tile_id] >= 0])
            for n in np.nonzero(hits[x, y])[0]:
                if int(n) not in cand_set:
                    missing += 1
    assert missing == 0


def test_tiled_matches_oracle(key):
    from tests._utils import assert_images_close

    g = random_scene(key, 400, extent=1.0)
    cam = _orbit_cam((64, 48))
    img_o = np.asarray(render_oracle(g, cam, depth=16))
    img_t = np.asarray(render_tiled(
        g, cam, depth=16, tile=(16, 8), max_candidates=400, max_global=64))
    assert_images_close(img_t, img_o)


def test_tiled_matches_oracle_camera_inside_scene(key):
    """Camera inside the cloud: many Gaussians straddle/behind the camera
    plane → exercises the global list path."""
    from tests._utils import assert_images_close

    g = random_scene(key, 200, extent=1.0)
    cam = camera_from_fov([0.1, 0.0, 0.1], [0, 0, 0, 1], (32, 24), 70.0)
    img_o = np.asarray(render_oracle(g, cam, depth=16))
    img_t = np.asarray(render_tiled(
        g, cam, depth=16, tile=(16, 8), max_candidates=256, max_global=200))
    assert_images_close(img_t, img_o)


def test_tiled_odd_resolution(key):
    """Resolutions that don't divide the tile size get padded and cropped."""
    from tests._utils import assert_images_close

    g = random_scene(key, 100, extent=0.8)
    cam = _orbit_cam((37, 23))
    img_o = np.asarray(render_oracle(g, cam, depth=8))
    img_t = np.asarray(render_tiled(
        g, cam, depth=8, tile=(16, 8), max_candidates=128, max_global=64))
    assert img_t.shape == (37, 23, 3)
    assert_images_close(img_t, img_o)


def test_tiled_gradients(key):
    """The tiled path is differentiable; grads match the oracle's where the
    candidate lists are complete."""
    g = random_scene(key, 60, extent=0.8)
    cam = _orbit_cam((16, 16))

    def loss_tiled(g):
        return jnp.sum(render_tiled(
            g, cam, depth=8, tile=(8, 8), max_candidates=64,
            max_global=32) ** 2)

    def loss_oracle(g):
        return jnp.sum(render_oracle(g, cam, depth=8) ** 2)

    gt = jax.grad(loss_tiled)(g)
    go = jax.grad(loss_oracle)(g)
    for name in ["means", "scales", "colors", "opacities", "sh"]:
        a, b = np.asarray(getattr(gt, name)), np.asarray(getattr(go, name))
        assert np.isfinite(a).all(), name
        scale = np.abs(b).max() + 1e-6
        # Same grazing-boundary caveat as images: allow a few flipped
        # entries, require the bulk to match.
        rel = np.abs(a - b) / scale
        assert np.quantile(rel, 0.99) < 1e-3, name
        assert rel.max() < 0.2, name


def test_overflow_counters(key):
    """Tiny candidate capacity must overflow and report it."""
    g = random_scene(key, 500, extent=0.3)  # dense cluster, same tiles
    cam = _orbit_cam((16, 16), r=2.0)
    binning = tile_candidates(g, cam, tile=(16, 16), max_candidates=8,
                              max_global=4)
    assert int(binning.local_overflow) > 0 or int(binning.global_overflow) > 0


def test_binning_counts_consistent(key):
    """The per-tile counts must equal the number of valid (non -1)
    candidate slots, and valid slots must form a contiguous prefix (the
    kernel's chunk skipping keys off the count). Round 4 rebuilt the
    placement as a gather from the sorted pair stream (the compacted
    pair buffer and its budget are gone — one sort, no O(pairs) scans)."""
    g = random_scene(key, 500, extent=1.2)
    cam = _orbit_cam((64, 64))
    binning = tile_candidates(g, cam, tile=(16, 16), max_candidates=256,
                              max_global=32)
    cands = np.asarray(binning.candidates)
    counts = np.asarray(binning.counts)
    valid = cands >= 0
    assert (valid.sum(axis=1) == counts).all()
    # Contiguous prefix: no valid slot after the first -1.
    for t in range(cands.shape[0]):
        assert not valid[t, counts[t]:].any(), t


def test_bitwise_determinism(key):
    """SURVEY §5: XLA's substitute for race detection — the same render
    twice must be bitwise identical (no atomics, no nondeterministic
    reductions anywhere in the pipeline)."""
    from rtgs_tpu.render.tiled import render_tiled_pallas

    g = random_scene(key, 300, extent=1.0)
    cam = _orbit_cam((64, 48))
    a = np.asarray(render_tiled_pallas(g, cam, depth=16))
    b = np.asarray(render_tiled_pallas(g, cam, depth=16))
    assert np.array_equal(a, b)  # bitwise, not allclose

    def loss(g):
        import jax.numpy as jnp
        return jnp.sum(render_tiled_pallas(g, cam, depth=16) ** 2)

    ga = jax.tree.leaves(jax.grad(loss)(g))
    gb = jax.tree.leaves(jax.grad(loss)(g))
    for x, y in zip(ga, gb):
        assert np.array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_million_splat_crop_matches_oracle():
    """VERDICT r2 next #3: at benchmark scale (>=1M splats) the production
    Pallas path must (a) drop zero candidate pairs with the bench budgets
    and (b) match the brute-force oracle on a rendered crop. A 64x64
    viewport keeps the oracle tractable on CPU; the scene is full-size."""
    import jax

    from rtgs_tpu.camera import camera_from_fov
    from rtgs_tpu.render.binning import tile_candidates
    from rtgs_tpu.render.oracle import render_oracle
    from rtgs_tpu.render.tiled import render_tiled_pallas
    from rtgs_tpu.scene import random_scene
    from rtgs_tpu.viewer.orbit import orbit_camera_pose

    n = 1_000_000
    g = random_scene(jax.random.PRNGKey(0), n, extent=2.0,
                     scale_range=(0.005, 0.03))
    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, (64, 64), 10.0)  # narrow-fov crop
    kw = dict(tile=(16, 16), max_candidates=16384, max_global=128)

    binning = jax.jit(lambda g: tile_candidates(g, cam, **kw))(g)
    assert int(binning.local_overflow) == 0, "crop budget must not drop"
    assert int(binning.global_overflow) == 0

    img_p = np.asarray(jax.jit(lambda g: render_tiled_pallas(
        g, cam, depth=16, **kw))(g))
    # (a) kernel vs peel_reference — the XLA execution of the IDENTICAL
    # packed-feature math and selection order: tight tolerance.
    from rtgs_tpu.ops.peel import peel_reference
    from rtgs_tpu.render.tiled import (_tile_pixel_features, pack_features,
                                       precompute_features)

    cand = binning.candidates
    pad_c = (-cand.shape[1]) % 128
    if pad_c:
        cand = jnp.pad(cand, ((0, 0), (0, pad_c)), constant_values=-1)
    packed = jax.jit(lambda g: pack_features(precompute_features(g, cam)))(g)
    pix = jax.jit(lambda: _tile_pixel_features(cam, (16, 16)))()
    rad_ref, _ = jax.jit(lambda p, c, x: peel_reference(p, c, x, 16))(
        packed, cand, pix)
    ntx = nty = 4
    img_ref = np.asarray(
        rad_ref.transpose(0, 2, 1).reshape(ntx, nty, 16, 16, 3)
        .transpose(0, 2, 1, 3, 4).reshape(64, 64, 3))
    np.testing.assert_allclose(img_p, img_ref, rtol=1e-4, atol=1e-4)
    # (b) vs the brute-force oracle: at ~8k candidates/pixel the oracle's
    # world-space quadratic and the kernel's camera-folded quadratic give
    # t1 values differing by ~1e-6 relative, which SWAPS near-tied depth
    # orders — per-pixel layer sets differ legitimately. Bound the
    # disagreement instead of demanding bitwise order parity.
    img_o = np.asarray(render_oracle(g, cam, depth=16))
    d = np.abs(img_p - img_o)
    assert np.mean(d) < 2e-3, np.mean(d)
    assert np.quantile(d, 0.99) < 3e-2, np.quantile(d, 0.99)
    assert d.max() < 0.15, d.max()
