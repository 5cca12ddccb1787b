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

        # Tiled-only tuning knobs (candidate budgets, banding) have no
        # meaning for brute force — drop them instead of raising so one CLI
        # flag set drives every path (ADVICE r3).
        kwargs = {k: v for k, v in kwargs.items()
                  if k not in ("max_candidates", "max_global", "pairs_budget",
                               "tile_bands", "max_tiles_local", "tile")}
        return render_oracle(g, camera, depth=depth, **kwargs)
    if renderer == "tiled":
        from rtgs_tpu.render.tiled import render_tiled

        # render_tiled has no banding knob (its per-chunk lax.map already
        # bounds memory) — accept and drop it (ADVICE r3).
        kwargs.pop("tile_bands", None)
        return render_tiled(g, camera, depth=depth, **kwargs)
    if renderer == "pallas":
        from rtgs_tpu.render.tiled import render_tiled_pallas

        return render_tiled_pallas(g, camera, depth=depth, **kwargs)
    raise ValueError(f"unknown renderer {renderer!r}")
