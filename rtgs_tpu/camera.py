"""Pinhole camera and ray-grid generation.

Conventions follow the reference exactly (``/root/reference/src/rtgs/
camera.py:8-71`` and ``docs/source/technical-blogs/coordinate-system.md``):
camera looks down **−z**, +y up, +x right; screen uv ∈ (0,1)² with (0,0) at
the bottom-left; rays are cast through pixel centers ``(i+0.5)/W``; focal
length is in pixels, derived from vertical FOV as
``focal = (H/2) / tan(fov·π/360)`` (``__main__.py:90-92``).

The ray *field* here is a batched computation over an index grid instead of a
per-pixel kernel — one fused XLA op instead of a Taichi parallel-for.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rtgs_tpu.rays import Rays
from rtgs_tpu.utils import quaternion as quat


@partial(jax.tree_util.register_dataclass,
         data_fields=["position", "rotation", "focal_length"],
         meta_fields=["buf_size"])
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera (reference ``camera.py:9-29``), a JAX pytree.

    ``buf_size`` is pytree *metadata* (static under ``jit`` — it determines
    array shapes); position/rotation/focal_length are traced leaves, so the
    training loop can differentiate camera pose if desired.

    Attributes:
      position:     (3,) camera position.
      rotation:     (4,) scalar-last quaternion, camera→world.
      buf_size:     (W, H) render buffer size in pixels (static).
      focal_length: (2,) focal length in pixels (fx, fy).
    """

    position: jnp.ndarray
    rotation: jnp.ndarray
    focal_length: jnp.ndarray
    buf_size: Tuple[int, int]


def new_camera(position, rotation, buf_size, focal_length) -> Camera:
    return Camera(
        position=jnp.asarray(position, jnp.float32),
        rotation=jnp.asarray(rotation, jnp.float32),
        focal_length=jnp.asarray(focal_length, jnp.float32),
        buf_size=(int(buf_size[0]), int(buf_size[1])),
    )


def camera_from_fov(position, rotation, buf_size, fov_deg: float) -> Camera:
    """Build a camera from vertical FOV in degrees, matching the reference
    CLI (``__main__.py:90-92``): ``focal = (H/2)/tan(fov·π/360)`` used for
    both axes."""
    half_angle = fov_deg * math.pi / 360.0
    focal = (buf_size[1] / 2.0) / math.tan(half_angle)
    return new_camera(position, rotation, buf_size, (focal, focal))


def generate_ray(camera: Camera, uv: jnp.ndarray) -> Rays:
    """Single/batched ray through screen coordinate(s) ``uv`` ∈ (0,1)²
    (reference ``camera.py:31-55``)."""
    censor = jnp.asarray(camera.buf_size, jnp.float32)
    pxy = (censor * uv - 0.5 * censor) / camera.focal_length
    d_cam = jnp.concatenate(
        [pxy, -jnp.ones_like(pxy[..., :1])], axis=-1)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    d_world = quat.rot_vec3(camera.rotation, d_cam)
    origins = jnp.broadcast_to(camera.position, d_world.shape)
    shape = d_world.shape[:-1]
    return Rays(
        origins=origins,
        directions=d_world,
        starts=jnp.zeros(shape, jnp.float32),
        ends=jnp.full(shape, jnp.inf, jnp.float32),
    )


def generate_ray_grid(camera: Camera, pixel_offset=None) -> Rays:
    """Per-pixel camera rays for the whole buffer, shaped (W, H) to match the
    reference's ``cam_ray_field[i, j]`` indexing (``camera.py:57-71``):
    index 0 is the x pixel (left→right), index 1 the y pixel (bottom→top),
    sampled at pixel centers.

    ``pixel_offset``: optional (2,) subpixel offset in pixel units added to
    the center sample point — the progressive-sampling jitter
    (render/api.py:render_progressive). ``None`` = exact reference centers.
    """
    w, h = camera.buf_size
    ox, oy = ((0.0, 0.0) if pixel_offset is None
              else (pixel_offset[0], pixel_offset[1]))
    i = (jnp.arange(w, dtype=jnp.float32) + 0.5 + ox) / w
    j = (jnp.arange(h, dtype=jnp.float32) + 0.5 + oy) / h
    uv = jnp.stack(jnp.meshgrid(i, j, indexing="ij"), axis=-1)  # (W, H, 2)
    return generate_ray(camera, uv)


def image_to_display(img_wh3: jnp.ndarray) -> jnp.ndarray:
    """Convert the internal (W, H, 3) bottom-left-origin buffer into a
    conventional (H, W, 3) top-row-first image for PNG export."""
    return jnp.transpose(img_wh3, (1, 0, 2))[::-1]
