"""Backend-selection helpers.

The deployment image registers and *initializes* the TPU (``axon``) PJRT
backend from a ``sitecustomize`` hook at interpreter startup, which makes the
usual ``JAX_PLATFORMS=cpu`` env override a no-op. Tests and multi-chip
dry-runs need a virtual CPU mesh, so :func:`force_cpu_devices` re-resolves the
backend after the fact.
"""

from __future__ import annotations

import os


def force_cpu_devices(count: int = 8) -> None:
    """Switch JAX to the host CPU platform with ``count`` virtual devices.

    Safe to call even after a backend has been initialized (clears and
    re-resolves). Must be called before any arrays you intend to keep are
    created.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={count}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as xb

        xb._clear_backends()
    except Exception:
        pass
    n = len(jax.local_devices())
    if n < count:
        raise RuntimeError(
            f"requested {count} virtual CPU devices but got {n}; "
            "XLA_FLAGS was read too late (a backend already initialized "
            "with different flags)")
