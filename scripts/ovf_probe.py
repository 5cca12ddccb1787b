"""Measure binning overflow for the bench configs on CPU (deterministic:
same PRNG seed as bench.py) to pick per-config candidate budgets such that
the dropped-pair fraction is < 0.1% (VERDICT r2 next #3)."""
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

import bench

for idx, cfg in enumerate(bench.CONFIGS):
    key = jax.random.PRNGKey(0)
    g = random_scene(key, cfg["n"], extent=2.0, scale_range=(0.005, 0.03))
    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, cfg["res"], 60.0)
    for mc in (512, 768, 1024, 1536, 2048):
        kw = dict(bench.RENDER_KW, **cfg.get("render_kw", {}))
        kw["max_candidates"] = mc
        b = jax.jit(lambda g: tile_candidates(g, cam, **kw))(g)
        live = int(jnp.sum(b.candidates >= 0))
        lo = int(b.local_overflow)
        go = int(b.global_overflow)
        frac = lo / max(live + lo, 1)
        cmax = int(jnp.max(b.counts))
        print(f"{cfg['label']:10s} mc={mc:5d} live={live} local_ovf={lo} "
              f"({frac:.3%}) global_ovf={go} max_count={cmax}", flush=True)
