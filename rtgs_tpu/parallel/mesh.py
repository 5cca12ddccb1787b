"""Device mesh construction for the renderer's two parallel axes.

The reference is strictly single-process, single-GPU (SURVEY.md §2.3); the
TPU framework's first-class parallelism is:

  * ``rays``  — pixel/ray data parallelism: the pixel grid is sharded across
    chips; embarrassingly parallel, no communication in the forward pass,
    gradient ``psum`` in training.
  * ``prims`` — primitive parallelism for scenes too large for one chip's
    HBM: the Gaussian SoA is sharded, and rendering runs a ring pass over
    shards (ring-attention structure: stationary queries = rays, rotating
    keys = Gaussians, online merge = depth-sorted top-K; SURVEY.md §5).

Collectives are XLA-compiled (``ppermute`` ring over ICI, ``psum`` for
grads); multi-host bring-up is ``jax.distributed.initialize`` + the same
mesh spanning all hosts' devices.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

RAYS_AXIS = "rays"
PRIMS_AXIS = "prims"


def make_mesh(n_rays: int = 0, n_prims: int = 1, devices=None) -> Mesh:
    """Build a ``(rays, prims)`` mesh.

    ``n_rays = 0`` uses all remaining devices on the rays axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_rays == 0:
        if n % n_prims:
            raise ValueError(f"{n} devices not divisible by prims={n_prims}")
        n_rays = n // n_prims
    if n_rays * n_prims > n:
        raise ValueError(
            f"mesh {n_rays}x{n_prims} needs {n_rays * n_prims} devices, "
            f"have {n}")
    grid = np.asarray(devices[: n_rays * n_prims]).reshape(n_rays, n_prims)
    return Mesh(grid, (RAYS_AXIS, PRIMS_AXIS))
