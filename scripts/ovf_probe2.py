"""1M@1080p binning sweep: candidate budget x tile size (CPU, deterministic)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtgs_tpu.utils.platform import force_cpu_devices  # noqa: E402

force_cpu_devices(1)

import jax
import jax.numpy as jnp
import numpy as np

from rtgs_tpu.camera import camera_from_fov
from rtgs_tpu.render.binning import tile_candidates
from rtgs_tpu.scene import random_scene
from rtgs_tpu.viewer.orbit import orbit_camera_pose

key = jax.random.PRNGKey(0)
g = random_scene(key, 1_000_000, extent=2.0, scale_range=(0.005, 0.03))
pos, rot, _, _ = orbit_camera_pose(
    0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
cam = camera_from_fov(pos, rot, (1920, 1088), 60.0)

for tile, mc in [((16, 16), 3072), ((16, 16), 4096), ((16, 16), 6144),
                 ((8, 8), 1024), ((8, 8), 1536), ((8, 8), 2048)]:
    b = jax.jit(lambda g: tile_candidates(
        g, cam, tile=tile, max_candidates=mc, max_global=128))(g)
    live = int(jnp.sum(b.candidates >= 0))
    lo = int(b.local_overflow)
    frac = lo / max(live + lo, 1)
    cnts = np.asarray(b.counts)
    print(f"tile={tile} mc={mc:5d} live={live} local_ovf={lo} ({frac:.3%}) "
          f"max_count={cnts.max()} mean_count={cnts.mean():.0f} "
          f"p99={np.percentile(cnts, 99):.0f} ntiles={cnts.size}",
          flush=True)
