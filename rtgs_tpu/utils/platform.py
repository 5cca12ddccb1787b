"""Backend-selection helpers.

The deployment image registers and *initializes* the TPU (``axon``) PJRT
backend from a ``sitecustomize`` hook at interpreter startup, which makes the
usual ``JAX_PLATFORMS=cpu`` env override a no-op. Tests and multi-chip
dry-runs need a virtual CPU mesh, so :func:`force_cpu_devices` re-resolves the
backend after the fact.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache. Compiles through the
    tunneled-TPU remote compiler take minutes; the cache makes repeat runs
    (tests, benchmarks, the driver's bench pass) start in seconds."""
    import jax

    path = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


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
