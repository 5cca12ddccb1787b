"""Quaternion math tests — same coverage as the reference's
``tests/test_quaternion.py`` (hand-computed Hamilton products, conjugate,
inverse round-trip, axis-angle round-trip, known 90° rotations, matrix
consistency), but batched."""

import numpy as np
import jax.numpy as jnp
import pytest

from rtgs_tpu.utils import quaternion as quat


def test_mul_hand_computed():
    # (1,2,3,4) * (5,6,7,8), scalar-last.
    p = jnp.array([1.0, 2.0, 3.0, 4.0])
    q = jnp.array([5.0, 6.0, 7.0, 8.0])
    out = quat.mul(p, q)
    # Hamilton: w = 4*8 - (1*5+2*6+3*7) = 32 - 38 = -6
    # v = 4*(5,6,7) + 8*(1,2,3) + (1,2,3)x(5,6,7)
    #   = (20,24,28)+(8,16,24)+(-4,8,-4) = (24,48,48)
    np.testing.assert_allclose(out, [24.0, 48.0, 48.0, -6.0], atol=1e-6)


def test_mul_identity():
    ident = jnp.array([0.0, 0.0, 0.0, 1.0])
    q = jnp.array([0.1, -0.2, 0.3, 0.9])
    np.testing.assert_allclose(quat.mul(ident, q), q, atol=1e-6)
    np.testing.assert_allclose(quat.mul(q, ident), q, atol=1e-6)


def test_conj():
    q = jnp.array([1.0, -2.0, 3.0, 4.0])
    np.testing.assert_allclose(quat.conj(q), [-1.0, 2.0, -3.0, 4.0])


def test_inv_roundtrip_unit(rng):
    q = rng.normal(size=(16, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q = jnp.asarray(q)
    out = quat.mul(q, quat.inv(q))
    expected = np.tile([0.0, 0.0, 0.0, 1.0], (16, 1))
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_axis_angle_roundtrip(rng):
    v = rng.normal(size=(32, 3)).astype(np.float32)
    out = quat.as_axis_angle(quat.from_axis_angle(jnp.asarray(v)))
    # Angles can wrap; restrict to |angle| < pi for a clean round-trip.
    ang = np.linalg.norm(v, axis=-1)
    sel = ang < np.pi
    np.testing.assert_allclose(np.asarray(out)[sel], v[sel], atol=1e-4)


def test_zero_axis_angle():
    v = jnp.zeros((3,))
    q = quat.from_axis_angle(v)
    np.testing.assert_allclose(q, [0.0, 0.0, 0.0, 1.0], atol=1e-7)
    np.testing.assert_allclose(quat.as_axis_angle(q), [0.0, 0.0, 0.0], atol=1e-7)


@pytest.mark.parametrize(
    "axis,vec,expected",
    [
        # 90° about z: x → y.
        ([0, 0, np.pi / 2], [1, 0, 0], [0, 1, 0]),
        # 90° about x: y → z.
        ([np.pi / 2, 0, 0], [0, 1, 0], [0, 0, 1]),
        # 90° about y: z → x.
        ([0, np.pi / 2, 0], [0, 0, 1], [1, 0, 0]),
    ],
)
def test_rot_vec3_known_rotations(axis, vec, expected):
    q = quat.from_axis_angle(jnp.asarray(axis, jnp.float32))
    out = quat.rot_vec3(q, jnp.asarray(vec, jnp.float32))
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_rotation_mat3_matches_rot_vec3(rng):
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    q, v = jnp.asarray(q), jnp.asarray(v)
    via_mat = jnp.einsum("nij,nj->ni", quat.as_rotation_mat3(q), v)
    via_quat = quat.rot_vec3(q, v)
    np.testing.assert_allclose(via_mat, via_quat, atol=1e-5)


def test_rotation_mat4(rng):
    q = rng.normal(size=(8, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    m4 = quat.as_rotation_mat4(jnp.asarray(q))
    m3 = quat.as_rotation_mat3(jnp.asarray(q))
    np.testing.assert_allclose(m4[:, :3, :3], m3, atol=1e-6)
    np.testing.assert_allclose(m4[:, 3, 3], np.ones(8))
    np.testing.assert_allclose(m4[:, 3, :3], np.zeros((8, 3)))
    np.testing.assert_allclose(m4[:, :3, 3], np.zeros((8, 3)))


def test_from_rotation_matrix_roundtrip(rng):
    q = rng.normal(size=(16, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    for i in range(16):
        m = np.asarray(quat.as_rotation_mat3(jnp.asarray(q[i], jnp.float32)))
        q2 = np.asarray(quat.from_rotation_matrix(m))
        # q and -q are the same rotation.
        if np.dot(q2, q[i]) < 0:
            q2 = -q2
        np.testing.assert_allclose(q2, q[i], atol=1e-5)
