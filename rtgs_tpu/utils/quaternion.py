"""Vectorized quaternion math on ``jnp`` arrays (scalar-last ``(x, y, z, w)``).

Semantics match the reference's Taichi quaternion utilities
(``/root/reference/src/rtgs/utils/quaternion.py:8-147``) but are batched,
differentiable, and shape-polymorphic: every function broadcasts over leading
axes, so the same code serves a single quaternion and a ``(N, 4)`` field.

Conventions:
  * Hamilton product, scalar-last storage.
  * ``rot_vec3(q, v) = (q * v * conj(q)).xyz`` — the reference convention
    (``utils/quaternion.py:84-96``).
  * ``as_rotation_mat3`` is built by rotating the three basis vectors, exactly
    like the reference (``utils/quaternion.py:99-121``), so non-unit quats get
    the same (scaled) matrix the reference produces.
"""

from __future__ import annotations

import jax.numpy as jnp


def mul(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product ``p q`` for scalar-last quaternions.

    Matches ``utils/quaternion.py:8-23`` in the reference.
    """
    pv, pw = p[..., :3], p[..., 3:4]
    qv, qw = q[..., :3], q[..., 3:4]
    w = pw * qw - jnp.sum(pv * qv, axis=-1, keepdims=True)
    v = pw * qv + qw * pv + jnp.cross(pv, qv)
    return jnp.concatenate([v, w], axis=-1)


def conj(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate (``utils/quaternion.py:26-35``)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def inv(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion inverse, ``conj(q) / |q|``.

    Note: the reference divides by ``|q|`` rather than ``|q|^2``
    (``utils/quaternion.py:38-47``) — exact only for unit quaternions. We keep
    the same semantics for parity.
    """
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return conj(q) / norm


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize to a unit quaternion."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def from_axis_angle(v: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vector (direction=axis, length=angle) → quaternion.

    Matches ``utils/quaternion.py:50-64``.
    """
    theta = jnp.linalg.norm(v, axis=-1, keepdims=True)
    safe = jnp.where(theta > 0, theta, 1.0)
    axis = jnp.where(theta > 0, v / safe * jnp.sin(theta / 2), v)
    w = jnp.cos(theta / 2)
    return jnp.concatenate([axis, w], axis=-1)


def as_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion → axis-angle vector (``utils/quaternion.py:67-81``)."""
    theta = jnp.arccos(jnp.clip(q[..., 3:4], -1.0, 1.0)) * 2
    xyz = q[..., :3]
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    safe = jnp.where(norm > 0, norm, 1.0)
    return jnp.where(norm > 0, xyz / safe * theta, jnp.zeros_like(xyz))


def rot_vec3(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) ``v`` by quaternion(s) ``q`` as ``q v q*``.

    Matches ``utils/quaternion.py:84-96``.
    """
    qv = jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)
    return mul(q, mul(qv, conj(q)))[..., :3]


def as_rotation_mat3(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion → 3×3 rotation matrix with columns ``q eᵢ q*``.

    Built by rotating basis vectors like the reference
    (``utils/quaternion.py:99-121``); broadcasts over leading axes and returns
    ``(..., 3, 3)``.
    """
    shape = q.shape[:-1]
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), shape + (3,))
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), shape + (3,))
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), shape + (3,))
    mx = rot_vec3(q, ex)
    my = rot_vec3(q, ey)
    mz = rot_vec3(q, ez)
    # Columns are the rotated basis vectors.
    return jnp.stack([mx, my, mz], axis=-1)


def as_rotation_mat4(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion → 4×4 homogeneous rotation matrix
    (``utils/quaternion.py:124-147``)."""
    m3 = as_rotation_mat3(q)
    shape = q.shape[:-1]
    m4 = jnp.zeros(shape + (4, 4), dtype=m3.dtype)
    m4 = m4.at[..., :3, :3].set(m3)
    m4 = m4.at[..., 3, 3].set(1.0)
    return m4


def from_rotation_matrix(m) -> jnp.ndarray:
    """Rotation matrix → scalar-last unit quaternion (host-side helper).

    Shepperd's method, numerically stable for all rotations. Used by the orbit
    camera controller (the reference uses the ``numpy-quaternion`` package for
    this, ``__main__.py:134``).
    """
    import numpy as np

    m = np.asarray(m, dtype=np.float64)
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (m[2, 1] - m[1, 2]) / s
        y = (m[0, 2] - m[2, 0]) / s
        z = (m[1, 0] - m[0, 1]) / s
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        w = (m[2, 1] - m[1, 2]) / s
        x = 0.25 * s
        y = (m[0, 1] + m[1, 0]) / s
        z = (m[0, 2] + m[2, 0]) / s
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        w = (m[0, 2] - m[2, 0]) / s
        x = (m[0, 1] + m[1, 0]) / s
        y = 0.25 * s
        z = (m[1, 2] + m[2, 1]) / s
    else:
        s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        w = (m[1, 0] - m[0, 1]) / s
        x = (m[0, 2] + m[2, 0]) / s
        y = (m[1, 2] + m[2, 1]) / s
        z = 0.25 * s
    q = np.array([x, y, z, w])
    return jnp.asarray(q / np.linalg.norm(q), dtype=jnp.float32)
