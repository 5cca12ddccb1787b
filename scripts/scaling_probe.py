"""1 → N virtual-device scaling of the production sharded renderer.

Runs ``render_tiled_sharded`` on a CPU-simulated mesh (the environment has
one physical TPU chip; multi-chip hardware is unavailable), sweeping the
prims-axis size at fixed scene/res, and reports per-step wall time. On
virtual CPU devices all "chips" share the host's cores, so ABSOLUTE times
are meaningless; what this validates is (a) the ring program compiles and
runs at every mesh size, and (b) work per device shrinks as 1/N (the
per-shard binning + kernel cost is the scaling surface; the ppermute ring
adds N-1 rotations of the shard).

Usage: python scripts/scaling_probe.py [n] [res_w] [res_h]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtgs_tpu.utils.platform import force_cpu_devices

force_cpu_devices(8)

import jax
import jax.numpy as jnp
import numpy as np

from rtgs_tpu.camera import camera_from_fov
from rtgs_tpu.parallel.mesh import make_mesh
from rtgs_tpu.parallel.render import render_tiled_sharded, shard_scene
from rtgs_tpu.scene import random_scene
from rtgs_tpu.viewer.orbit import orbit_camera_pose


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    g = random_scene(jax.random.PRNGKey(0), n, extent=2.0,
                     scale_range=(0.005, 0.03))
    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, (w, h), 60.0)

    results = {}
    for n_prims in (1, 2, 4, 8):
        mesh = make_mesh(1, n_prims)
        gs = shard_scene(g, mesh)

        def run():
            img = render_tiled_sharded(gs, cam, mesh, depth=16,
                                       max_candidates=512)
            return jax.block_until_ready(img)

        run()  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[1]
        results[n_prims] = dt
        print(f"prims={n_prims}: {dt*1e3:8.1f} ms/frame "
              f"({w*h/dt/1e6:.2f} Mrays/s aggregate)", flush=True)

    base = results[1]
    for n_prims, dt in results.items():
        print(f"prims={n_prims}: relative wall {dt/base:.2f}x "
              f"(ring adds {n_prims-1} shard rotations)")


if __name__ == "__main__":
    main()
