"""On-chip vs interpret-mode parity check of the production Pallas path —
the check every round must pass before publishing a throughput number.

Round-3 discovery: the hardware kernel's output contains NaNs at bench
scale while the SAME program under the Pallas interpreter (and the XLA
tiled path, and the oracle) is correct; every golden/parity test runs the
interpreter on CPU, so nothing caught it. This script renders a small
frame of the bench scene on whatever backend is active and prints
summary statistics plus per-layer NaN locations from the top-K output.

Run it twice and diff:
  python scripts/chip_parity.py                 # tunneled chip
  JAX(cpu via conftest trick) ...               # interpret reference
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    res = (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 \
        else (320, 192)

    from rtgs_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from rtgs_tpu.camera import camera_from_fov
    from rtgs_tpu.ops.peel import peel_topk_pallas, _counts
    from rtgs_tpu.render.binning import tile_candidates
    from rtgs_tpu.render.tiled import (_tile_pixel_features, pack_features,
                                       precompute_features,
                                       render_tiled_pallas)
    from rtgs_tpu.scene import random_scene
    from rtgs_tpu.viewer.orbit import orbit_camera_pose

    print("backend:", jax.default_backend())
    g = random_scene(jax.random.PRNGKey(0), n, extent=2.0,
                     scale_range=(0.005, 0.03))
    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, res, 60.0)
    kw = dict(tile=(16, 16), max_candidates=1536, max_global=128)

    img = np.asarray(jax.jit(lambda g: render_tiled_pallas(
        g, cam, depth=16, **kw))(g))
    print(f"render: mean|.|={np.abs(img).mean():.4f} "
          f"nan%={np.isnan(img).mean():.1%} max={np.nanmax(img):.3f}")

    # Layer-level diagnosis through the top-K output.
    binning = jax.jit(lambda g: tile_candidates(g, cam, **kw))(g)
    cand = binning.candidates
    pad_c = (-cand.shape[1]) % 128
    if pad_c:
        cand = jnp.pad(cand, ((0, 0), (0, pad_c)), constant_values=-1)
    packed = jax.jit(lambda g: pack_features(precompute_features(g, cam)))(g)
    pix = jax.jit(lambda: _tile_pixel_features(cam, (16, 16)))()
    t1, alpha, r, gg, b = jax.jit(
        lambda p, c, x: peel_topk_pallas(p, c, x, 16))(packed, cand, pix)
    for name, x in (("t1", t1), ("alpha", alpha), ("r", r)):
        x = np.asarray(x)
        print(f"{name}: nan%={np.isnan(x).mean():.2%} "
              f"inf%={np.isinf(x).mean():.2%} "
              f"finite-mean={np.nanmean(np.where(np.isfinite(x), x, np.nan)):.4f}")
    counts = np.asarray(_counts(cand))
    bad_tiles = np.isnan(np.asarray(alpha)).any(axis=(1, 2))
    print(f"tiles with NaN alpha: {bad_tiles.sum()}/{bad_tiles.size}; "
          f"their counts: {sorted(set(counts[bad_tiles].tolist()))[:10]}")


if __name__ == "__main__":
    main()
