"""Progressive sampling (reference ``ray_tracer.py:39-77`` +
``__main__.py:253-258``): accumulation machinery, parity of the no-jitter
mode with a single render, and the documented deviation (whole-sample
display denominator — one fused pass composites all layers, so there are
no partial passes to display fractionally)."""

import numpy as np
import jax
import jax.numpy as jnp

from rtgs_tpu.camera import camera_from_fov
from rtgs_tpu.render.api import (ProgressiveSampler, render,
                                 render_progressive)
from rtgs_tpu.scene import random_scene
from rtgs_tpu.viewer.orbit import orbit_camera_pose


def _orbit_cam(res, theta=0.3, phi=1.2, r=3.0, fov=60.0):
    pos, rot, _, _ = orbit_camera_pose(
        theta, phi, r, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    return camera_from_fov(pos, rot, res, fov)


def test_no_jitter_samples_equal_single_render(key):
    """Reference parity: deterministic pixel-center rays make every sample
    identical, so N accumulated samples == 1 sample exactly — the converged
    display buffer (ray_tracer.py:68-77)."""
    g = random_scene(key, 150, extent=0.8)
    cam = _orbit_cam((32, 32))
    one = np.asarray(render(g, cam, depth=8))
    many = np.asarray(render_progressive(g, cam, depth=8, samples=4))
    np.testing.assert_array_equal(one, many)


def test_sampler_accumulates_and_displays(key):
    g = random_scene(key, 150, extent=0.8)
    cam = _orbit_cam((32, 32))
    s = ProgressiveSampler(g, cam, depth=8)
    s.sample().sample().sample()
    assert s.num_samples == 3
    disp = np.asarray(s.display())
    one = np.asarray(render(g, cam, depth=8))
    # Identical samples: buf/3 == one up to the f32 add/divide round-trip.
    np.testing.assert_allclose(disp, one, rtol=0, atol=1e-6)
    s.clear()
    assert s.num_samples == 0


def test_jittered_sampling_antialiases(key):
    """With jitter on, sample 1 is the reference center sample and later
    samples differ (subpixel offsets) — the average is a valid AA image:
    finite, in-range, and close to the center image in the bulk."""
    g = random_scene(key, 150, extent=0.8)
    cam = _orbit_cam((32, 32))
    one = np.asarray(render(g, cam, depth=8))
    aa = np.asarray(render_progressive(
        g, cam, depth=8, samples=4, jitter=True,
        key=jax.random.PRNGKey(7)))
    assert np.isfinite(aa).all()
    assert not np.array_equal(aa, one)        # jitter actually did work
    assert np.abs(aa - one).mean() < 0.05     # but stays the same image
    # First sample is the exact center render: accumulating with jitter
    # starting from it keeps the mean unbiased around the reference image.
    s = ProgressiveSampler(g, cam, depth=8, jitter=True,
                           key=jax.random.PRNGKey(7))
    s.sample()
    np.testing.assert_array_equal(np.asarray(s.display()), one)


def test_cli_sample_flag(tmp_path, key):
    """-s N with the deterministic renderer must produce the same PNG as
    -s 1 (documented deviation: flag honored, samples identical)."""
    from rtgs_tpu.__main__ import main
    from rtgs_tpu.scene import save_scene

    ply = tmp_path / "s.ply"
    save_scene(ply, random_scene(key, 64, extent=0.5))
    out1 = tmp_path / "a.png"
    out4 = tmp_path / "b.png"
    main(["render", "-o", str(ply), "-r", "32,32", "-s", "1",
          "--radius", "2.0", "--output", str(out1)])
    main(["render", "-o", str(ply), "-r", "32,32", "-s", "4",
          "--radius", "2.0", "--output", str(out4)])
    assert out1.read_bytes() == out4.read_bytes()
