from rtgs_tpu.parallel.mesh import RAYS_AXIS, PRIMS_AXIS, make_mesh
from rtgs_tpu.parallel.render import render_sharded, shard_scene

__all__ = [
    "RAYS_AXIS",
    "PRIMS_AXIS",
    "make_mesh",
    "render_sharded",
    "shard_scene",
]
