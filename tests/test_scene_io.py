"""Scene loading & PLY I/O tests: the 62-property 3DGS schema contract
(reference ``tests/data/test.ply`` + ``scene.py:89-160`` activations),
round-tripping, and padding."""

import pathlib

import numpy as np
import pytest

from rtgs_tpu import gaussians as G
from rtgs_tpu.io.ply import read_ply, write_ply
from rtgs_tpu.scene import (
    inverse_sigmoid,
    load_scene,
    pad_scene,
    save_scene,
    sigmoid,
)

REFERENCE_FIXTURE = pathlib.Path("/root/reference/tests/data/test.ply")


def _make_fixture(tmp_path, n=16, seed=7, fmt="binary_little_endian"):
    """Generate a synthetic 62-property 3DGS PLY matching the canonical
    schema (same property list as the reference fixture)."""
    rng = np.random.default_rng(seed)
    cols = {}
    for k in ["x", "y", "z"]:
        cols[k] = rng.normal(size=n).astype(np.float32)
    for k in ["nx", "ny", "nz"]:
        cols[k] = np.zeros(n, np.float32)
    for i in range(3):
        cols[f"f_dc_{i}"] = rng.normal(size=n).astype(np.float32)
    for i in range(45):
        cols[f"f_rest_{i}"] = rng.normal(size=n).astype(np.float32) * 0.1
    cols["opacity"] = rng.normal(size=n).astype(np.float32)
    for i in range(3):
        cols[f"scale_{i}"] = rng.normal(size=n).astype(np.float32) - 2
    for i in range(4):
        cols[f"rot_{i}"] = rng.normal(size=n).astype(np.float32)
    path = tmp_path / "fixture.ply"
    write_ply(path, cols, fmt=fmt)
    return path, cols


@pytest.mark.parametrize("fmt", ["binary_little_endian", "ascii"])
def test_ply_roundtrip(tmp_path, fmt):
    path, cols = _make_fixture(tmp_path, fmt=fmt)
    back = read_ply(path)
    assert list(back.keys()) == list(cols.keys())
    for k in cols:
        np.testing.assert_allclose(back[k], cols[k], rtol=1e-6)


def test_load_scene_activations(tmp_path):
    """exp(scale)·g, sigmoid(color/opacity), quat reorder+normalize
    (scene.py:103-114)."""
    path, cols = _make_fixture(tmp_path)
    g = load_scene(path, scale=2.0)
    n = 16
    assert g.num == n
    np.testing.assert_allclose(
        g.means, np.stack([cols["x"], cols["y"], cols["z"]], 1), rtol=1e-6)
    expected_scales = np.exp(
        np.stack([cols[f"scale_{i}"] for i in range(3)], 1)) * 2.0
    np.testing.assert_allclose(g.scales, expected_scales, rtol=1e-5)
    np.testing.assert_allclose(
        g.colors,
        sigmoid(np.stack([cols[f"f_dc_{i}"] for i in range(3)], 1)),
        rtol=1e-5)
    np.testing.assert_allclose(
        g.opacities, sigmoid(cols["opacity"].astype(np.float64)), rtol=1e-5)
    # Scalar-first → scalar-last, normalized.
    raw = np.stack([cols["rot_1"], cols["rot_2"], cols["rot_3"], cols["rot_0"]], 1)
    raw = raw / np.linalg.norm(raw, axis=-1, keepdims=True)
    np.testing.assert_allclose(g.quats, raw, rtol=1e-5)
    # SH: inria layout pairs f_rest_{c*15+k} as (coeff k, channel c).
    assert g.sh.shape == (n, 15, 3)
    np.testing.assert_allclose(
        np.asarray(g.sh)[:, 2, 1], cols["f_rest_17"], rtol=1e-6)


def test_load_scene_reference_flat_layout(tmp_path):
    path, cols = _make_fixture(tmp_path)
    g = load_scene(path, sh_layout="reference_flat")
    # Flat reinterpretation: sh[i, j, l] = f_rest_{3j+l}.
    np.testing.assert_allclose(
        np.asarray(g.sh)[:, 2, 1], cols["f_rest_7"], rtol=1e-6)


def test_scene_roundtrip_through_save(tmp_path, key):
    from rtgs_tpu.scene import random_scene

    g = random_scene(key, 25)
    out = tmp_path / "saved.ply"
    save_scene(out, g)
    g2 = load_scene(out)
    np.testing.assert_allclose(g2.means, g.means, rtol=1e-5)
    np.testing.assert_allclose(g2.scales, g.scales, rtol=1e-4)
    np.testing.assert_allclose(g2.colors, g.colors, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g2.opacities, g.opacities, rtol=1e-4)
    np.testing.assert_allclose(g2.sh, g.sh, rtol=1e-4, atol=1e-6)
    # Quats match up to sign.
    q1, q2 = np.asarray(g.quats), np.asarray(g2.quats)
    sign = np.sign(np.sum(q1 * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q1, atol=1e-5)


@pytest.mark.skipif(
    not REFERENCE_FIXTURE.exists(), reason="reference fixture not present")
def test_reference_fixture_parses():
    """The reference's own 16-splat fixture (the canonical schema contract,
    SURVEY.md §4) must load."""
    g = load_scene(REFERENCE_FIXTURE)
    assert g.num == 16
    assert np.isfinite(np.asarray(g.means)).all()
    assert (np.asarray(g.opacities) >= 0).all()
    assert (np.asarray(g.opacities) <= 1).all()
    assert (np.asarray(g.scales) > 0).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(g.quats), axis=-1), np.ones(16), rtol=1e-5)


def test_pad_scene(key):
    from rtgs_tpu.scene import random_scene

    g = random_scene(key, 10)
    gp = pad_scene(g, 8)
    assert gp.num == 16
    np.testing.assert_allclose(gp.mask[10:], np.zeros(6))
    np.testing.assert_allclose(gp.opacities[10:], np.zeros(6))
    np.testing.assert_allclose(gp.scales[10:], np.ones((6, 3)))
    assert pad_scene(gp, 8) is gp  # already aligned → no-op


def test_sigmoid_inverse():
    x = np.linspace(-8, 8, 33)
    np.testing.assert_allclose(inverse_sigmoid(sigmoid(x)), x, rtol=1e-9)


def test_splt_roundtrip(tmp_path, key):
    """.splt (antimatter15 .splat layout) save -> load round-trip. The
    format quantizes colors/opacity/quats to u8 and drops SH."""
    from rtgs_tpu.scene import load_scene, random_scene, save_scene

    g = random_scene(key, 40, extent=0.8)
    p = tmp_path / "scene.splt"
    save_scene(p, g)
    assert p.stat().st_size == 40 * 32
    g2 = load_scene(p)
    np.testing.assert_allclose(np.asarray(g2.means), np.asarray(g.means),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.scales), np.asarray(g.scales),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.colors), np.asarray(g.colors),
                               atol=1 / 255.0)
    np.testing.assert_allclose(np.asarray(g2.opacities),
                               np.asarray(g.opacities), atol=1 / 255.0)
    # Quats quantized to u8; compare up to sign (q and -q are one rotation).
    q1 = np.asarray(g.quats)
    q2 = np.asarray(g2.quats)
    sign = np.sign(np.sum(q1 * q2, axis=1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q1, atol=2 / 128.0)
    assert np.abs(np.asarray(g2.sh)).max() == 0.0
