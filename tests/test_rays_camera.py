"""Ray and camera tests — covers the reference's ``tests/test_ray.py`` (ctor
defaults, get()) plus pinhole conventions the reference leaves untested."""

import numpy as np
import jax.numpy as jnp

from rtgs_tpu.camera import (
    camera_from_fov,
    generate_ray,
    generate_ray_grid,
    image_to_display,
    new_camera,
)
from rtgs_tpu.rays import new_rays
from rtgs_tpu.utils import quaternion as quat


def test_ray_defaults():
    r = new_rays(np.zeros((2, 3)), np.tile([0, 1, 0.0], (2, 1)))
    np.testing.assert_allclose(r.starts, np.zeros(2))
    assert np.isinf(np.asarray(r.ends)).all()


def test_ray_get(rng):
    o = rng.normal(size=(16, 3)).astype(np.float32)
    d = rng.normal(size=(16, 3)).astype(np.float32)
    t = rng.uniform(0, 10, size=(16,)).astype(np.float32)
    r = new_rays(o, d)
    np.testing.assert_allclose(
        r.get(jnp.asarray(t)), o + t[:, None] * d, rtol=1e-5)


def test_center_ray_looks_minus_z():
    cam = new_camera([0, 0, 0], [0, 0, 0, 1], (4, 4), (2.0, 2.0))
    r = generate_ray(cam, jnp.array([0.5, 0.5]))
    np.testing.assert_allclose(r.directions, [0, 0, -1.0], atol=1e-6)
    np.testing.assert_allclose(r.origins, [0, 0, 0.0], atol=1e-6)


def test_corner_ray_direction():
    """uv=(1,1): pxy = (W/2/fx, H/2/fy); dir ∝ (pxy, −1) normalized
    (reference camera.py:46-52)."""
    w, h, f = 8, 6, 4.0
    cam = new_camera([0, 0, 0], [0, 0, 0, 1], (w, h), (f, f))
    r = generate_ray(cam, jnp.array([1.0, 1.0]))
    expect = np.array([w / 2 / f, h / 2 / f, -1.0])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(r.directions, expect, atol=1e-6)


def test_ray_grid_pixel_centers():
    w, h = 4, 2
    cam = new_camera([0, 0, 0], [0, 0, 0, 1], (w, h), (2.0, 2.0))
    rays = generate_ray_grid(cam)
    assert rays.directions.shape == (w, h, 3)
    # Pixel (i, j) center: uv = ((i+0.5)/W, (j+0.5)/H) (camera.py:67-71).
    r_single = generate_ray(cam, jnp.array([(2 + 0.5) / w, (1 + 0.5) / h]))
    np.testing.assert_allclose(
        rays.directions[2, 1], r_single.directions, atol=1e-6)


def test_rotated_camera():
    """Rotate camera 90° about y: camera −z maps to world −x."""
    q = quat.from_axis_angle(jnp.array([0.0, np.pi / 2, 0.0]))
    cam = new_camera([1, 2, 3], q, (4, 4), (2.0, 2.0))
    r = generate_ray(cam, jnp.array([0.5, 0.5]))
    np.testing.assert_allclose(r.directions, [-1.0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(r.origins, [1, 2, 3.0], atol=1e-6)


def test_camera_from_fov():
    """focal = (H/2)/tan(fov·π/360) (reference __main__.py:90-92)."""
    cam = camera_from_fov([0, 0, 0], [0, 0, 0, 1], (960, 540), 90.0)
    np.testing.assert_allclose(cam.focal_length, [270.0, 270.0], rtol=1e-6)


def test_image_to_display():
    img = jnp.arange(2 * 3 * 3, dtype=jnp.float32).reshape(2, 3, 3)  # (W,H,3)
    disp = np.asarray(image_to_display(img))
    assert disp.shape == (3, 2, 3)
    # Top row of the display = highest j.
    np.testing.assert_allclose(disp[0, 0], img[0, 2])
    np.testing.assert_allclose(disp[-1, 1], img[1, 0])
