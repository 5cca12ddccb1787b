"""Staged TPU probe: time compile + run of each pipeline stage."""
import sys
import time

t00 = time.time()


def log(msg):
    print(f"[{time.time()-t00:7.1f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp

from rtgs_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()
log(f"backend = {jax.default_backend()}, devices = {jax.devices()}")

import numpy as np
from rtgs_tpu.camera import camera_from_fov
from rtgs_tpu.scene import random_scene
from rtgs_tpu.viewer.orbit import orbit_camera_pose

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
RES = (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 else (640, 384)
MC = int(sys.argv[4]) if len(sys.argv) > 4 else 512
MG = int(sys.argv[5]) if len(sys.argv) > 5 else 128
TW = int(sys.argv[6]) if len(sys.argv) > 6 else 16
TH = int(sys.argv[7]) if len(sys.argv) > 7 else 16
SKIP_BWD = len(sys.argv) > 8 and sys.argv[8] == "nobwd"

key = jax.random.PRNGKey(0)
g = random_scene(key, N, extent=2.0, scale_range=(0.005, 0.03))
jax.block_until_ready(g)
log(f"scene built: N={N}")

pos, rot, _, _ = orbit_camera_pose(
    0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
cam = camera_from_fov(pos, rot, RES, 60.0)

from rtgs_tpu.render.binning import tile_candidates

binf = jax.jit(lambda g: tile_candidates(
    g, cam, tile=(TW, TH), max_candidates=MC, max_global=MG))
t0 = time.time()
b = jax.block_until_ready(binf(g))
log(f"binning compile+run: {time.time()-t0:.1f}s, cand shape "
    f"{b.candidates.shape}, local_ovf={int(b.local_overflow)}, "
    f"global_ovf={int(b.global_overflow)}")
t0 = time.time()
b = jax.block_until_ready(binf(g))
log(f"binning run: {(time.time()-t0)*1e3:.1f}ms")

from rtgs_tpu.render.tiled import render_tiled_pallas

fwd = lambda g: render_tiled_pallas(
    g, cam, depth=16, tile=(TW, TH), max_candidates=MC, max_global=MG)
t0 = time.time()
img = jax.block_until_ready(fwd(g))
log(f"fwd compile+run: {time.time()-t0:.1f}s")
t0 = time.time()
img = jax.block_until_ready(fwd(g))
tf = time.time() - t0
rays = RES[0] * RES[1]
log(f"fwd run: {tf*1e3:.1f}ms = {rays/tf/1e6:.1f}M rays/s")


if SKIP_BWD:
    sys.exit(0)


@jax.jit
def grad_fn(gg):
    return jax.grad(lambda gg: jnp.sum(fwd(gg)))(gg)


t0 = time.time()
jax.block_until_ready(grad_fn(g))
log(f"fwd+bwd compile+run: {time.time()-t0:.1f}s")
t0 = time.time()
jax.block_until_ready(grad_fn(g))
tb = time.time() - t0
log(f"fwd+bwd run: {tb*1e3:.1f}ms = {rays/tb/1e6:.1f}M rays/s")
