"""Multi-device rendering: ray data-parallelism × primitive ring sharding.

Structure (SURVEY.md §5 "long-context equivalent"): rays are stationary
queries sharded over the ``rays`` mesh axis; the Gaussian SoA is sharded over
``prims`` and rotated around the ring with ``ppermute`` (XLA lowers this onto
ICI). Each ring step computes the local shard's top-K nearest hits per ray
and merges them into the running K-list by entry depth — an online,
depth-sorted merge that is exactly equivalent to a global top-K, so the
sharded render is bit-comparable to the single-device oracle (up to f32 and
equal-t1 tie order).

Differentiable end-to-end: JAX transposes ``ppermute`` (reverse ring) and the
top-K gathers, so parameter gradients flow back to the shard that owns each
Gaussian; gradients of replicated quantities are ``psum``-reduced by
``shard_map``'s partitioning rules automatically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rtgs_tpu import gaussians as G
from rtgs_tpu.parallel.mesh import PRIMS_AXIS, RAYS_AXIS
from rtgs_tpu.rays import Rays
from rtgs_tpu.render.oracle import topk_hits, composite_hits
from rtgs_tpu.scene import pad_scene


def shard_scene(g: G.Gaussians, mesh: Mesh) -> G.Gaussians:
    """Pad N to the prims-axis size and place the SoA with its leading axis
    sharded over ``prims`` (replicated over ``rays``)."""
    n_prims = mesh.shape[PRIMS_AXIS]
    g = pad_scene(g, n_prims)
    spec = NamedSharding(mesh, P(PRIMS_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, spec), g)


def _merge_topk(best, new, k):
    """Merge two per-ray K-lists, keeping the K nearest by t1."""
    t1 = jnp.concatenate([best[0], new[0]], axis=-1)       # (p, 2K)
    alpha = jnp.concatenate([best[1], new[1]], axis=-1)
    rgb = jnp.concatenate([best[2], new[2]], axis=-2)      # (p, 2K, 3)
    vals, idx = jax.lax.top_k(-t1, k)
    return (
        -vals,
        jnp.take_along_axis(alpha, idx, axis=-1),
        jnp.take_along_axis(rgb, idx[..., None], axis=-2),
    )


def _ring_body(rays: Rays, depth: int, n_prims: int):
    def step(carry, _):
        g_shard, best = carry
        new = topk_hits(g_shard, rays, depth)
        best = _merge_topk(best, new, depth)
        if n_prims > 1:
            perm = [(j, (j + 1) % n_prims) for j in range(n_prims)]
            g_shard = jax.tree.map(
                lambda x: jax.lax.ppermute(x, PRIMS_AXIS, perm), g_shard)
        return (g_shard, best), None

    return step


@partial(jax.jit, static_argnames=("depth", "mesh"))
def render_sharded(g: G.Gaussians, rays: Rays, depth: int, mesh: Mesh):
    """Render a flat ray bundle on a ``(rays, prims)`` mesh.

    Args:
      g: scene sharded over ``prims`` (see :func:`shard_scene`); N must be a
        multiple of the prims-axis size.
      rays: flat bundle; leading dim must be a multiple of the rays-axis
        size.
      depth: composited layers K.
      mesh: the device mesh.

    Returns:
      (radiance (P, 3), transmittance (P,)), sharded over ``rays``.
    """
    n_prims = mesh.shape[PRIMS_AXIS]

    def local(g_shard, rays_local):
        p = rays_local.starts.shape[0]
        best = (
            jnp.full((p, depth), jnp.inf, jnp.float32),
            jnp.zeros((p, depth), jnp.float32),
            jnp.zeros((p, depth, 3), jnp.float32),
        )
        # The scan carry becomes varying over both mesh axes (it mixes the
        # rays-sharded queries with the prims-sharded scene); mark the
        # literal-initialized carry accordingly for shard_map's vma typing.
        best = jax.tree.map(
            lambda x: jax.lax.pcast(x, (RAYS_AXIS, PRIMS_AXIS),
                                    to="varying"), best)
        (_, best), _ = jax.lax.scan(
            _ring_body(rays_local, depth, n_prims),
            (g_shard, best), None, length=n_prims)
        radiance, trans = composite_hits(*best)
        return radiance, trans

    # After the full ring every prims-rank holds the identical merged K-list,
    # so the output *is* replicated over ``prims``; shard_map's varying-axis
    # type system cannot prove that invariant statically (there is
    # deliberately no varying→invariant cast), hence check_vma=False.
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(PRIMS_AXIS), P(RAYS_AXIS)),
        out_specs=P(RAYS_AXIS),
        check_vma=False,
    )(g, rays)
