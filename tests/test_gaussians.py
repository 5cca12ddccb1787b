"""Gaussian primitive math tests — covers the reference's
``tests/test_gaussian.py`` (ctor defaults, unit-Gaussian hit from origin) and
adds covariance/AABB/SH checks the reference lacks (SURVEY.md §4 gaps)."""

import numpy as np
import jax.numpy as jnp

from rtgs_tpu import gaussians as G
from rtgs_tpu.rays import new_rays
from rtgs_tpu.utils import quaternion as quat


def test_ctor_defaults():
    g = G.new_gaussians(means=np.zeros((4, 3)))
    np.testing.assert_allclose(g.quats, np.tile([0, 0, 0, 1.0], (4, 1)))
    np.testing.assert_allclose(g.scales, np.ones((4, 3)))
    np.testing.assert_allclose(g.colors, np.tile([1, 0, 1.0], (4, 1)))
    np.testing.assert_allclose(g.opacities, np.ones(4))
    assert g.sh.shape == (4, 15, 3)
    np.testing.assert_allclose(g.mask, np.ones(4))


def test_covariance_identity_rotation():
    q = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    s = jnp.array([[2.0, 3.0, 4.0]])
    cov = G.covariance(q, s)
    np.testing.assert_allclose(cov[0], np.diag([4.0, 9.0, 16.0]), atol=1e-5)


def test_covariance_rotated(rng):
    q = rng.normal(size=(8, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = rng.uniform(0.5, 2.0, size=(8, 3)).astype(np.float32)
    cov = np.asarray(G.covariance(jnp.asarray(q), jnp.asarray(s)))
    r = np.asarray(quat.as_rotation_mat3(jnp.asarray(q)))
    expected = np.einsum("nij,nj,nkj->nik", r, s * s, r)
    np.testing.assert_allclose(cov, expected, atol=1e-5)
    # Symmetric PSD.
    np.testing.assert_allclose(cov, np.swapaxes(cov, 1, 2), atol=1e-6)


def test_inv_covariance_agreement(rng):
    """Adjugate inverse (reference semantics) and R S⁻² Rᵀ (production path)
    must agree."""
    q = rng.normal(size=(16, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = rng.uniform(0.5, 2.0, size=(16, 3)).astype(np.float32)
    a = np.asarray(G.inv_covariance(jnp.asarray(q), jnp.asarray(s)))
    b = np.asarray(G.inv_covariance_direct(jnp.asarray(q), jnp.asarray(s)))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)
    cov = np.asarray(G.covariance(jnp.asarray(q), jnp.asarray(s)))
    np.testing.assert_allclose(
        np.einsum("nij,njk->nik", cov, a),
        np.tile(np.eye(3), (16, 1, 1)), atol=1e-3)


def test_hit_unit_gaussian_from_origin():
    """Reference ``tests/test_gaussian.py:65-84``: rays from the origin of a
    unit Gaussian hit the √3-radius sphere symmetrically: t = ±√3."""
    cov_inv = jnp.eye(3)[None]
    means = jnp.zeros((1, 3))
    d = jnp.array([[1.0, 0.0, 0.0]])
    t1, t2 = G.hit(cov_inv, means, jnp.zeros((1, 3)), d)
    np.testing.assert_allclose(t1, [-np.sqrt(3)], atol=1e-5)
    np.testing.assert_allclose(t2, [np.sqrt(3)], atol=1e-5)


def test_hit_miss_is_inf():
    cov_inv = jnp.eye(3)[None]
    means = jnp.zeros((1, 3))
    origins = jnp.array([[0.0, 10.0, 0.0]])  # far off axis
    d = jnp.array([[1.0, 0.0, 0.0]])
    t1, t2 = G.hit(cov_inv, means, origins, d)
    assert np.isinf(t1).all() and np.isinf(t2).all()


def test_hit_scaled_translated():
    """Gaussian at (5,0,0) with scale (2,1,1): ray along +x hits at
    5 ± 2√3."""
    g = G.new_gaussians(means=[[5.0, 0.0, 0.0]], scales=[[2.0, 1.0, 1.0]])
    cov_inv = G.inv_covariance(g.quats, g.scales)
    t1, t2 = G.hit(cov_inv, g.means, jnp.zeros((1, 3)),
                   jnp.array([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(t1, [5 - 2 * np.sqrt(3)], rtol=1e-5)
    np.testing.assert_allclose(t2, [5 + 2 * np.sqrt(3)], rtol=1e-5)


def test_hit_rotation_invariance(rng):
    """Rotating a Gaussian about the ray axis must not change the hit of an
    axis-aligned isotropic-in-plane Gaussian."""
    q = quat.from_axis_angle(jnp.array([1.0, 0.0, 0.0]) * 0.7)
    g = G.new_gaussians(
        means=[[3.0, 0.0, 0.0]], quats=q[None], scales=[[1.0, 0.5, 0.5]])
    cov_inv = G.inv_covariance(g.quats, g.scales)
    t1, t2 = G.hit(cov_inv, g.means, jnp.zeros((1, 3)),
                   jnp.array([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(t1, [3 - np.sqrt(3)], rtol=1e-4)
    np.testing.assert_allclose(t2, [3 + np.sqrt(3)], rtol=1e-4)


def test_aabb_axis_aligned():
    g = G.new_gaussians(means=[[1.0, 2.0, 3.0]], scales=[[0.5, 1.0, 2.0]])
    pmin, pmax = G.aabb(g.means, g.quats, g.scales)
    np.testing.assert_allclose(pmin[0], [1 - 1.5, 2 - 3, 3 - 6], atol=1e-5)
    np.testing.assert_allclose(pmax[0], [1 + 1.5, 2 + 3, 3 + 6], atol=1e-5)


def test_aabb_matches_endpoint_construction(rng):
    """AABB equals the box of the 6 endpoints μ ± 3·sᵢ·(R eᵢ)
    (reference gaussian.py:104-138)."""
    q = rng.normal(size=(32, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = rng.uniform(0.2, 2.0, size=(32, 3)).astype(np.float32)
    mu = rng.normal(size=(32, 3)).astype(np.float32)
    pmin, pmax = G.aabb(jnp.asarray(mu), jnp.asarray(q), jnp.asarray(s))
    r = np.asarray(quat.as_rotation_mat3(jnp.asarray(q)))
    pts = []
    for axis in range(3):
        e = np.zeros(3)
        e[axis] = G.BOUNDING_THRESHOLD
        off = np.einsum("nij,j->ni", r, e) * s[:, axis][:, None]
        pts += [mu + off, mu - off]
    pts = np.stack(pts, axis=1)  # (N, 6, 3)
    np.testing.assert_allclose(pmin, pts.min(1), atol=1e-5)
    np.testing.assert_allclose(pmax, pts.max(1), atol=1e-5)


def test_aabb_conservative_for_hit_ellipsoid(rng):
    """Any ray entry point t1 must lie inside the AABB (the BVH/tile culling
    soundness property the whole acceleration design rests on)."""
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = rng.uniform(0.1, 1.5, size=(64, 3)).astype(np.float32)
    mu = rng.normal(size=(64, 3)).astype(np.float32) * 2
    g = G.new_gaussians(means=mu, quats=q, scales=s)
    cov_inv = G.inv_covariance(g.quats, g.scales)
    origins = rng.normal(size=(128, 3)).astype(np.float32) * 5
    dirs = rng.normal(size=(128, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    t1, t2 = G.hit(cov_inv[None], g.means[None],
                   jnp.asarray(origins)[:, None], jnp.asarray(dirs)[:, None])
    pmin, pmax = G.aabb(g.means, g.quats, g.scales)
    t1 = np.asarray(t1)
    hit_mask = np.isfinite(t1)
    pts = origins[:, None, :] + t1[..., None] * dirs[:, None, :]
    inside = ((pts >= np.asarray(pmin)[None] - 1e-3)
              & (pts <= np.asarray(pmax)[None] + 1e-3)).all(-1)
    assert inside[hit_mask].all()


def test_sh_basis_constants():
    """Spot-check the reference's hardcoded basis (gaussian.py:140-163),
    including the y_33 quirk (5z²−3z, gaussian.py:160)."""
    d = jnp.array([0.3, -0.5, 0.8])
    d = d / jnp.linalg.norm(d)
    x, y, z = np.asarray(d)
    basis = np.asarray(G.sh_basis(d))
    assert basis.shape == (15,)
    np.testing.assert_allclose(basis[0], 0.5 * G.C_0 * y, rtol=1e-6)
    np.testing.assert_allclose(basis[1], 0.5 * G.C_0 * z, rtol=1e-6)
    np.testing.assert_allclose(basis[2], 0.5 * G.C_0 * x, rtol=1e-6)
    np.testing.assert_allclose(basis[5], 0.25 * G.C_2 * (3 * z**2 - 1), rtol=1e-5)
    np.testing.assert_allclose(
        basis[11], 0.25 * G.C_6 * (5 * z**2 - 3 * z), rtol=1e-5)


def test_eval_sh_linear_in_coeffs(rng, key):
    sh = rng.normal(size=(4, 15, 3)).astype(np.float32)
    d = jnp.array([0.0, 0.0, 1.0])
    out = np.asarray(G.eval_sh(jnp.asarray(sh), d))
    basis = np.asarray(G.sh_basis(d))
    expected = np.einsum("k,nkc->nc", basis, sh)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_eval_gaussian_peak():
    """At the center, ρ = 1 → α = opacity; color = base + SH."""
    g = G.new_gaussians(means=[[0.0, 0.0, 0.0]], opacities=[0.7],
                        colors=[[0.2, 0.4, 0.6]])
    cov_inv = G.inv_covariance(g.quats, g.scales)
    rgb, alpha = G.eval_gaussian(
        cov_inv[0], g.means[0], g.colors[0], g.opacities[0], g.sh[0],
        jnp.zeros(3), jnp.array([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(alpha, 0.7, rtol=1e-6)
    # sh = 0 → rgb = base color.
    np.testing.assert_allclose(rgb, [0.2, 0.4, 0.6], atol=1e-6)


def test_eval_gaussian_falloff_no_half_factor():
    """ρ = exp(−dᵀΣ⁻¹d) with NO ½ factor (reference gaussian.py:197)."""
    g = G.new_gaussians(means=[[0.0, 0.0, 0.0]])
    cov_inv = G.inv_covariance(g.quats, g.scales)
    pos = jnp.array([1.0, 0.0, 0.0])
    _, alpha = G.eval_gaussian(
        cov_inv[0], g.means[0], g.colors[0], g.opacities[0], g.sh[0],
        pos, jnp.array([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(alpha, np.exp(-1.0), rtol=1e-5)
