"""Chipless AOT compile of the FULL production render program (binning +
gather + bands + kernel) at a given scene size — isolates whether a config
that hangs the remote compile helper is a genuine compile bomb or a
tunnel-side wedge (the local libtpu is the same compiler).

Usage: python scripts/aotc_render.py [n] [w] [h] [mc] [bands] [mode]
  mode: pallas | keys | keysgrad (default pallas)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import topologies
from jax.sharding import SingleDeviceSharding


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1088
    mc = int(sys.argv[4]) if len(sys.argv) > 4 else 4096
    bands = int(sys.argv[5]) if len(sys.argv) > 5 else 8

    from rtgs_tpu.camera import camera_from_fov
    from rtgs_tpu.render import tiled
    from rtgs_tpu.ops import peel
    from rtgs_tpu import gaussians as G
    from rtgs_tpu.viewer.orbit import orbit_camera_pose

    peel._interpret = lambda: False  # force the Mosaic path

    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, (w, h), 60.0)

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    sh = SingleDeviceSharding(topo.devices[0])

    g = G.Gaussians(
        means=jnp.zeros((n, 3), jnp.float32),
        quats=jnp.zeros((n, 4), jnp.float32),
        scales=jnp.ones((n, 3), jnp.float32),
        colors=jnp.zeros((n, 3), jnp.float32),
        opacities=jnp.zeros((n,), jnp.float32),
        sh=jnp.zeros((n, 15, 3), jnp.float32),
        mask=jnp.ones((n,), jnp.float32),
    )
    shaped = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh), g)

    mode = sys.argv[6] if len(sys.argv) > 6 else "pallas"

    def fn(g):
        if mode == "binning":
            from rtgs_tpu.render.binning import tile_candidates

            return tile_candidates(g, cam, tile=(16, 16),
                                   max_candidates=mc, max_global=128)
        if mode == "shade":
            from rtgs_tpu.render.tiled import (composite_layers_kp,
                                               shade_winners_kp,
                                               _tile_pixel_features,
                                               pack_features,
                                               precompute_features)

            packed = pack_features(precompute_features(g, cam))
            pix = _tile_pixel_features(cam, (16, 16))
            t = pix.shape[0]
            nb = -(-t // bands) if bands > 1 else t
            sid = jnp.zeros((nb, 16, pix.shape[1]), jnp.float32)
            out = shade_winners_kp(packed, sid, pix[:nb])
            return composite_layers_kp(*out)
        if mode == "pallas":
            return tiled.render_tiled_pallas(
                g, cam, depth=16, tile=(16, 16), max_candidates=mc,
                max_global=128, tile_bands=bands if bands > 1 else None,
                with_stats=True)
        if mode == "keys":
            return tiled.render_tiled_keys(
                g, cam, depth=16, tile=(16, 16), max_candidates=mc,
                max_global=128, tile_bands=bands if bands > 1 else None,
                with_stats=True)
        return jax.grad(lambda gg: jnp.sum(tiled.render_tiled_keys(
            gg, cam, depth=16, tile=(16, 16), max_candidates=mc,
            max_global=128,
            tile_bands=bands if bands > 1 else None)))(g)

    print(f"n={n} {w}x{h} mc={mc} bands={bands} mode={mode}", flush=True)
    t0 = time.perf_counter()
    lowered = jax.jit(fn).trace(shaped).lower(lowering_platforms=("tpu",))
    t1 = time.perf_counter()
    print(f"lower {t1-t0:.1f}s", flush=True)
    compiled = lowered.compile()
    t2 = time.perf_counter()
    mem = compiled.memory_analysis()
    print(f"compile {t2-t1:.1f}s  "
          f"temp={getattr(mem, 'temp_size_in_bytes', '?')}", flush=True)


if __name__ == "__main__":
    main()
