"""Renderer dispatch: one ``render()`` entry point over the available paths.

  * ``oracle`` — brute force O(N·P), exact reference semantics
    (:mod:`rtgs_tpu.render.oracle`). Differentiable.
  * ``tiled``  — tile-binned candidate lists + fused Pallas peel kernel
    (:mod:`rtgs_tpu.render.tiled`). The production path. Differentiable with
    a hand-written backward.
  * ``auto``   — tiled for large scenes, oracle for small ones.
"""

from __future__ import annotations

import jax.numpy as jnp

from rtgs_tpu import gaussians as G
from rtgs_tpu.camera import Camera

# Below this many Gaussians brute force is both exact and faster than
# binning overhead.
_ORACLE_MAX_N = 4096


def render(g: G.Gaussians, camera: Camera, depth: int = 16,
           renderer: str = "auto", **kwargs) -> jnp.ndarray:
    """Render a full frame. Returns (W, H, 3) radiance."""
    if renderer == "auto":
        if g.num <= _ORACLE_MAX_N:
            renderer = "oracle"
        else:
            import jax

            renderer = "pallas" if jax.default_backend() == "tpu" else "tiled"
    if renderer == "oracle":
        from rtgs_tpu.render.oracle import render_oracle

        return render_oracle(g, camera, depth=depth, **kwargs)
    if renderer == "tiled":
        from rtgs_tpu.render.tiled import render_tiled

        return render_tiled(g, camera, depth=depth, **kwargs)
    if renderer == "pallas":
        from rtgs_tpu.render.tiled import render_tiled_pallas

        return render_tiled_pallas(g, camera, depth=depth, **kwargs)
    raise ValueError(f"unknown renderer {renderer!r}")
