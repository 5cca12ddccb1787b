"""Ray bundles as a structure-of-arrays pytree.

The reference stores a per-pixel Taichi struct field of rays
(``/root/reference/src/rtgs/ray.py:4-68``); here a bundle is a NamedTuple of
flat arrays so it can be vmapped, jitted, and sharded across the ``rays`` mesh
axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Rays(NamedTuple):
    """A bundle of rays.

    Attributes:
      origins:    (..., 3) ray origins.
      directions: (..., 3) ray directions (unit length for camera rays).
      starts:     (...,)   minimum accepted ``t`` (exclusive; ``ray.py:17``).
      ends:       (...,)   maximum accepted ``t`` (exclusive; ``inf`` for
                  camera rays, ``ray.py:18``).
    """

    origins: jnp.ndarray
    directions: jnp.ndarray
    starts: jnp.ndarray
    ends: jnp.ndarray

    def get(self, t: jnp.ndarray) -> jnp.ndarray:
        """Position along the ray: ``origin + t · direction``
        (``ray.py:43-52``)."""
        return self.origins + t[..., None] * self.directions

    def reshape(self, *shape) -> "Rays":
        return Rays(
            self.origins.reshape(*shape, 3),
            self.directions.reshape(*shape, 3),
            self.starts.reshape(*shape),
            self.ends.reshape(*shape),
        )


def new_rays(origins, directions, starts=None, ends=None) -> Rays:
    """Constructor with the reference's defaults (``ray.py:55-68``):
    ``start=0``, ``end=inf``."""
    origins = jnp.asarray(origins, jnp.float32)
    directions = jnp.asarray(directions, jnp.float32)
    shape = origins.shape[:-1]
    if starts is None:
        starts = jnp.zeros(shape, jnp.float32)
    else:
        starts = jnp.broadcast_to(jnp.asarray(starts, jnp.float32), shape)
    if ends is None:
        ends = jnp.full(shape, jnp.inf, jnp.float32)
    else:
        ends = jnp.broadcast_to(jnp.asarray(ends, jnp.float32), shape)
    return Rays(origins, directions, starts, ends)
