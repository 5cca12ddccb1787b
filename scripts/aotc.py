"""Local chipless AOT compile harness for the Pallas kernels.

The tunneled-TPU remote compiler takes ~15 minutes per attempt; the same
libtpu that the tunnel's compile-helper uses is present locally, so Mosaic
compile problems (VMEM overruns, register spills, lowering errors) can be
reproduced in-process against a v5e:1x1x1 topology without any hardware.

Usage:
  python scripts/aotc.py fwd  [n_tiles] [cand] [pix]   # forward kernel
  python scripts/aotc.py bwd  ...                      # backward kernel
  python scripts/aotc.py topk ...                      # top-K kernel fwd
  python scripts/aotc.py all                           # everything, default dims
Env: RTGS_TILE_BLOCK to sweep the tile-block size.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Chipless: force the CPU client for execution plumbing; compile AOT against
# a TPU topology description. The image's sitecustomize registers the
# tunneled-TPU (axon) PJRT plugin at interpreter startup — BEFORE this
# script runs — and a registered TPU plugin hijacks both
# ``topologies.get_topology_desc(platform="tpu")`` and Pallas compiles into
# multi-minute remote tunnel calls. In-script env edits are too late, so
# re-exec with the axon trigger vars stripped (sitecustomize then skips
# registration entirely and the local libtpu Mosaic compiler is used).
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


def aot_compile(fn, *args, topo_name="v5e:2x2"):
    # v5e:2x2 is the smallest topology the local libtpu accepts (one full
    # host); the program is compiled for a single device of it, which is
    # exactly the v5e chip target the tunnel runs on.
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=topo_name)
    dev = topo.devices[0]
    sh = SingleDeviceSharding(dev)
    shaped = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.asarray(x).dtype,
                                       sharding=sh), args)
    t0 = time.perf_counter()
    lowered = jax.jit(fn).trace(*shaped).lower(lowering_platforms=("tpu",))
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    mem = compiled.memory_analysis()
    print(f"  lower {t1-t0:.1f}s  compile {t2-t1:.1f}s  "
          f"argbytes={getattr(mem, 'argument_size_in_bytes', '?')} "
          f"temp={getattr(mem, 'temp_size_in_bytes', '?')}")
    return compiled


def _inputs(t=64, c=640, p=256, n=10000, seed=0):
    from rtgs_tpu.ops.peel import F_DIM, G_DIM

    rng = np.random.default_rng(seed)
    packed = jnp.asarray(rng.normal(size=(n + 1, F_DIM)), jnp.float32)
    cand = jnp.asarray(
        rng.integers(-1, n, size=(t, c)), jnp.int32)
    pad_c = (-c) % 128
    if pad_c:
        cand = jnp.pad(cand, ((0, 0), (0, pad_c)), constant_values=-1)
    pix = jnp.asarray(rng.normal(size=(t, p, G_DIM)), jnp.float32)
    return packed, cand, pix


def main():
    from rtgs_tpu.ops import peel

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 640
    p = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    depth = int(os.environ.get("RTGS_DEPTH", "16"))
    packed, cand, pix = _inputs(t, c, p)
    # Force the real Mosaic path even though the backend is CPU.
    peel._interpret = lambda: False

    from rtgs_tpu.ops.peel import _tile_block

    print(f"tile_block={_tile_block()} "
          f"t={t} c={cand.shape[1]} p={p} depth={depth}")
    if which in ("fwd", "all"):
        print("fwd kernel:")
        aot_compile(
            lambda pk: peel.peel_pallas(pk, cand, pix, depth), packed)
    if which in ("bwd", "all"):
        print("bwd kernel (jax.grad through custom vjp):")

        def loss(pk):
            rad, trans = peel.peel_pallas(pk, cand, pix, depth)
            return jnp.sum(rad) + jnp.sum(trans)

        aot_compile(jax.grad(loss), packed)
    if which in ("topk", "all"):
        print("topk fwd kernel:")
        aot_compile(
            lambda pk: peel.peel_topk_pallas(pk, cand, pix, depth), packed)


if __name__ == "__main__":
    main()
