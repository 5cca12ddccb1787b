"""Substantiate (or refute) the grad-allreduce/backward overlap claim
(BASELINE.json north star: gradients "all-reduced over ICI, overlapped
with the backward compositing sweep").

Round-3 result: with default compiler options the data-parallel gradient
psum compiles to a SYNCHRONOUS all-reduce at the end of the backward —
claim withdrawn. Round 4 re-examines with the two levers that actually
control overlap on TPU:

  1. ``--lhs`` — XLA's latency-hiding scheduler
     (``--xla_tpu_enable_latency_hiding_scheduler=true``), the production
     knob that splits collectives into async start/done pairs and hoists
     compute between them;
  2. ``--bands N`` — a manually banded backward: a ``lax.scan`` over ray
     bands, each iteration computing that band's parameter-gradient
     contribution and ``psum``-ing it immediately, so band i's all-reduce
     can ride ICI while band i+1's backward computes on the MXU/VPU.

Multi-chip hardware is unavailable here (one tunneled chip), so the
check is at the compiled-HLO level against a v5e:2x2 topology: async
start/done pairs with real compute scheduled between them ARE the
overlap mechanism; the script prints, for each async pair, how many
non-trivial compute ops the scheduler placed inside the window.

Chipless: re-execs with the tunneled-backend env stripped, same as
scripts/aotc.py.

Usage: python scripts/overlap_check.py [n_splats] [--bands N] [--lhs]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=4096)
    ap.add_argument("--bands", type=int, default=0,
                    help="banded backward with per-band psum (0 = single "
                         "monolithic grad + one psum)")
    ap.add_argument("--lhs", action="store_true",
                    help="compile with the latency-hiding scheduler")
    ap.add_argument("--unroll", action="store_true",
                    help="unroll the band loop (psums in the top-level "
                         "computation instead of a while body)")
    ap.add_argument("--no-combine", action="store_true",
                    help="disable the all-reduce combiner so per-band "
                         "psums stay separate ops")
    args = ap.parse_args()
    n = args.n

    from rtgs_tpu.camera import camera_from_fov, generate_ray_grid
    from rtgs_tpu.render.oracle import composite_rays
    from rtgs_tpu.scene import random_scene

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    devices = topo.devices
    mesh = Mesh(np.array(devices).reshape(4, 1), ("rays", "prims"))

    g = random_scene(jax.random.PRNGKey(0), n, extent=1.5,
                     scale_range=(0.01, 0.05))
    cam = camera_from_fov(np.array([0.0, 0.0, 4.0]),
                          np.array([0.0, 0.0, 0.0, 1.0]), (64, 64), 60.0)
    rays = generate_ray_grid(cam)
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rays)
    target = jnp.zeros((64 * 64, 3), jnp.float32)

    ray_sharding = NamedSharding(mesh, P("rays"))
    rep = NamedSharding(mesh, P())

    if args.bands:
        bands = args.bands

        def grad_fn(g, flat, target):
            def local(g, flat_l, target_l):
                fb = jax.tree.map(
                    lambda x: x.reshape((bands, -1) + x.shape[1:]), flat_l)
                tb = target_l.reshape((bands, -1, 3))

                def body(acc, band):
                    r, t = band

                    def loss(gg):
                        rad, _ = composite_rays(gg, r, depth=8)
                        return jnp.mean((rad - t) ** 2) / bands

                    gr = jax.grad(loss)(g)
                    # Per-band all-reduce: issued while the NEXT band's
                    # backward runs (given an async-capable schedule).
                    gr = jax.tree.map(
                        lambda x: jax.lax.psum(x, "rays"), gr)
                    return jax.tree.map(jnp.add, acc, gr), None

                zero = jax.tree.map(
                    lambda x: jnp.zeros_like(x), g)
                zero = jax.tree.map(
                    lambda x: jax.lax.pcast(x, ("rays",), to="varying"),
                    zero)
                if args.unroll:
                    # Unrolled: every band's psum lives in the TOP-LEVEL
                    # computation, where the latency-hiding scheduler can
                    # split it into an async pair and hoist the next
                    # band's backward between start and done. (In the
                    # lax.scan form each psum is the ROOT of the while
                    # body — nothing can schedule after it without
                    # cross-iteration collective pipelining.)
                    acc = zero
                    for b in range(bands):
                        acc, _ = body(acc, jax.tree.map(
                            lambda x: x[b], (fb, tb)))
                    return acc
                acc, _ = jax.lax.scan(body, zero, (fb, tb))
                return acc

            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(), P("rays"), P("rays")),
                out_specs=P(), check_vma=False,
            )(g, flat, target)
    else:
        def loss_fn(g, flat, target):
            rad, _ = composite_rays(g, flat, depth=8)
            return jnp.mean((rad - target) ** 2)

        grad_fn = jax.grad(loss_fn)

    shaped = (
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=rep), g),
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=ray_sharding), flat),
        jax.ShapeDtypeStruct(target.shape, target.dtype,
                             sharding=ray_sharding),
    )
    options = {}
    if args.lhs:
        # The production overlap knobs on XLA:TPU — latency-hiding
        # scheduler + async all-reduce + collective/compute fusion (the
        # same set large-model training stacks enable).
        for opt in ("xla_tpu_enable_latency_hiding_scheduler",
                    "xla_enable_async_all_reduce",
                    "xla_tpu_enable_async_collective_fusion",
                    "xla_tpu_enable_async_collective_fusion_fuse_all_reduce",
                    "xla_tpu_overlap_compute_collective_tc",
                    "xla_tpu_enable_data_parallel_all_reduce_opt",
                    "xla_tpu_data_parallel_opt_different_sized_ops"):
            options[opt] = "true"
    if args.no_combine:
        options["xla_all_reduce_combine_threshold_bytes"] = "0"
    compiled = jax.jit(
        grad_fn,
        in_shardings=(rep, ray_sharding, ray_sharding),
        out_shardings=rep,
    ).trace(*shaped).lower(lowering_platforms=("tpu",)).compile(
        compiler_options=options)

    hlo = compiled.as_text()
    starts = re.findall(r"all-reduce-start[^\n]*", hlo)
    dones = len(re.findall(r"all-reduce-done", hlo))
    sync = len(re.findall(r"%all-reduce[.\d]* = ", hlo))
    tag = f"bands={args.bands or 1} lhs={args.lhs}"
    out_path = f"/tmp/overlap_hlo_b{args.bands}_lhs{int(args.lhs)}.txt"
    open(out_path, "w").write(hlo)
    print(f"[{tag}] hlo -> {out_path} ({len(hlo)} chars)")
    print(f"[{tag}] async all-reduce-start/done: {len(starts)}/{dones}; "
          f"synchronous all-reduce: {sync}")

    # Evidence of OVERLAP, not just async form: count non-trivial compute
    # ops the scheduler placed between each start and its done.
    lines = hlo.splitlines()
    compute_re = re.compile(
        r"= (fusion|dot|convolution|reduce|custom-call|scatter|sort)")
    window = 0
    in_win = False
    per_pair = []
    for ln in lines:
        if "all-reduce-start" in ln:
            in_win, window = True, 0
        elif "all-reduce-done" in ln and in_win:
            per_pair.append(window)
            in_win = False
        elif in_win and compute_re.search(ln):
            window += 1
    if per_pair:
        print(f"[{tag}] compute ops inside async windows: {per_pair} "
              f"(total {sum(per_pair)})")
    # Placement evidence for synchronous ops: where in the (scheduled)
    # entry computation each all-reduce sits, as a fraction of its ops.
    entry = hlo[hlo.rfind("ENTRY"):]
    elines = entry.splitlines()
    pos = [i for i, ln in enumerate(elines) if "all-reduce" in ln
           and "= " in ln and "get-tuple-element" not in ln]
    if pos:
        print(f"[{tag}] sync all-reduce placement in entry schedule: "
              f"{[round(p / max(len(elines), 1), 3) for p in pos]} "
              f"(fraction of {len(elines)} scheduled lines)")
    if starts and dones and sum(per_pair) > 0:
        print(f"[{tag}] VERDICT: async all-reduce pairs WITH compute "
              "scheduled inside the windows — the backward overlaps the "
              "gradient all-reduce in the compiled schedule.")
    elif starts and dones:
        print(f"[{tag}] VERDICT: async pairs exist but no compute inside "
              "the windows — form only, no realized overlap.")
    else:
        print(f"[{tag}] VERDICT: synchronous all-reduce — no overlap with "
              "this configuration.")


if __name__ == "__main__":
    main()
