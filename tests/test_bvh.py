"""LBVH tests: structural invariants of the Karras build, AABB containment,
and nearest-hit query parity against brute force (the coverage the reference
never had for its BVH — SURVEY.md §4 "gaps to inherit deliberately" says we
must NOT inherit this one)."""

import numpy as np
import jax
import jax.numpy as jnp

from rtgs_tpu import gaussians as G
from rtgs_tpu.bvh import LBVH, build_lbvh, bvh_hit, morton_codes
from rtgs_tpu.rays import new_rays
from rtgs_tpu.scene import random_scene


def test_morton_orders_locality():
    pts = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.01, 0.0, 0.0]])
    codes = np.asarray(morton_codes(pts, jnp.zeros(3), jnp.ones(3)))
    # Near-identical points get near-identical codes.
    assert codes[0] == codes[2] or abs(int(codes[0]) - int(codes[2])) < int(
        codes[1])


def _check_tree(bvh: LBVH, n):
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    prim = np.asarray(bvh.prim)
    # Every node except the root has exactly one parent.
    children = np.concatenate([left[: n - 1], right[: n - 1]])
    assert len(children) == 2 * (n - 1)
    counts = np.bincount(children, minlength=2 * n - 1)
    assert counts[0] == 0  # root is nobody's child
    assert (counts[1:] == 1).all()
    # Leaves hold a permutation of primitives.
    leaves = prim[n - 1:]
    assert sorted(leaves.tolist()) == list(range(n))
    # AABB containment: parent contains children.
    pmin = np.asarray(bvh.pmin)
    pmax = np.asarray(bvh.pmax)
    for i in range(n - 1):
        for ch in (left[i], right[i]):
            assert (pmin[i] <= pmin[ch] + 1e-5).all(), (i, ch)
            assert (pmax[i] >= pmax[ch] - 1e-5).all(), (i, ch)


def test_build_structure(key):
    g = random_scene(key, 64, extent=1.0)
    bvh = build_lbvh(g.means, g.quats, g.scales, g.mask)
    _check_tree(bvh, 64)


def test_build_structure_odd_sizes(key):
    for n in (2, 3, 7, 33):
        g = random_scene(jax.random.fold_in(key, n), n, extent=1.0)
        bvh = build_lbvh(g.means, g.quats, g.scales, g.mask)
        _check_tree(bvh, n)


def test_build_duplicate_positions(key):
    """Identical centroids (equal Morton codes) must still build a valid
    tree (index-augmented tie-break)."""
    g = random_scene(key, 16, extent=1.0)
    means = g.means.at[4:8].set(g.means[0])
    bvh = build_lbvh(means, g.quats, g.scales, g.mask)
    _check_tree(bvh, 16)


def test_escape_traversal_visits_all_leaves(key):
    """Following left-child/escape links from the root enumerates every
    leaf exactly once (the stackless invariant)."""
    n = 32
    g = random_scene(key, n, extent=1.0)
    bvh = build_lbvh(g.means, g.quats, g.scales, g.mask)
    left = np.asarray(bvh.left)
    escape = np.asarray(bvh.escape)
    prim = np.asarray(bvh.prim)
    seen = []
    node, steps = 0, 0
    while node >= 0 and steps < 10 * n:
        if prim[node] >= 0:
            seen.append(int(prim[node]))
            node = escape[node]
        else:
            node = left[node]
        steps += 1
    assert sorted(seen) == list(range(n))


def test_bvh_hit_matches_bruteforce(key):
    g = random_scene(key, 200, extent=1.0)
    bvh = build_lbvh(g.means, g.quats, g.scales, g.mask)
    k1, k2 = jax.random.split(key)
    origins = jax.random.uniform(k1, (128, 3), minval=-3, maxval=3)
    dirs = jax.random.normal(k2, (128, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = new_rays(origins, dirs)

    hit = bvh_hit(bvh, g, rays)

    cov_inv = G.inv_covariance(g.quats, g.scales)
    t1, t2 = G.hit(cov_inv, g.means, origins[:, None], dirs[:, None])
    valid = (t1 > 0) & jnp.isfinite(t1)
    t1m = np.asarray(jnp.where(valid, t1, jnp.inf))
    brute_idx = t1m.argmin(-1)
    brute_t1 = t1m.min(-1)
    miss = ~np.isfinite(brute_t1)
    brute_idx = np.where(miss, -1, brute_idx)

    np.testing.assert_array_equal(np.asarray(hit.gaussian_idx), brute_idx)
    got_t1 = np.asarray(hit.t1)
    np.testing.assert_allclose(got_t1[~miss], brute_t1[~miss], rtol=1e-5)
    assert np.isinf(got_t1[miss]).all()


def test_bvh_hit_respects_interval(key):
    """start/end clipping (open interval) matches the reference accept rule
    (scene.py:433)."""
    g = random_scene(key, 50, extent=1.0)
    bvh = build_lbvh(g.means, g.quats, g.scales, g.mask)
    origins = jnp.tile(jnp.array([[0.0, 0.0, 3.0]]), (1, 1))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (1, 1))
    free = bvh_hit(bvh, g, new_rays(origins, dirs))
    assert int(free.gaussian_idx[0]) >= 0
    # Clip start past the first hit → must find a strictly farther one
    # (or miss).
    clipped = bvh_hit(
        bvh, g, new_rays(origins, dirs, starts=float(free.t1[0]) + 1e-4))
    if int(clipped.gaussian_idx[0]) >= 0:
        assert float(clipped.t1[0]) > float(free.t1[0])


def test_bvh_masked_primitives_invisible(key):
    g = random_scene(key, 40, extent=0.5)
    rays = new_rays([[0.0, 0.0, 3.0]], [[0.0, 0.0, -1.0]])
    bvh = build_lbvh(g.means, g.quats, g.scales, g.mask)
    first = bvh_hit(bvh, g, rays)
    assert int(first.gaussian_idx[0]) >= 0
    # Mask out the hit Gaussian; it must vanish.
    mask2 = g.mask.at[int(first.gaussian_idx[0])].set(0.0)
    g2 = g._replace(mask=mask2)
    bvh2 = build_lbvh(g2.means, g2.quats, g2.scales, g2.mask)
    second = bvh_hit(bvh2, g2, rays)
    assert int(second.gaussian_idx[0]) != int(first.gaussian_idx[0])


def test_lbvh_all_duplicate_morton_codes(key):
    """Adversarial: thousands of Gaussians at the SAME position collapse
    every Morton code to one value — the degenerate deep-tree case the
    fixed 2*log2(n)+8 propagation-pass bound must still cover (VERDICT r1
    weak #6; bvh.py's pass-count comment was previously only asserted)."""
    n = 4096
    means = jnp.zeros((n, 3)) + 0.5
    quats = jnp.zeros((n, 4)).at[:, 3].set(1.0)
    scales = jnp.full((n, 3), 0.01)
    bvh = build_lbvh(means, quats, scales)
    # Root AABB must cover the (identical) leaf bounds.
    pmin, pmax = G.aabb(means, quats, scales)
    assert float(bvh.pmin[0, 0]) <= float(jnp.min(pmin[:, 0])) + 1e-5
    assert float(bvh.pmax[0, 0]) >= float(jnp.max(pmax[:, 0])) - 1e-5

    # A ray through the cluster must hit (traversal terminates + finds it).
    g = G.Gaussians(
        means=means, quats=quats, scales=scales,
        colors=jnp.full((n, 3), 0.5), opacities=jnp.full((n,), 0.8),
        sh=jnp.zeros((n, 15, 3)), mask=jnp.ones((n,)))
    rays = new_rays(jnp.asarray([[0.5, 0.5, -5.0]]),
                    jnp.asarray([[0.0, 0.0, 1.0]]))
    hit = bvh_hit(bvh, g, rays)
    assert int(hit.gaussian_idx[0]) >= 0
    assert np.isfinite(float(hit.t1[0]))
