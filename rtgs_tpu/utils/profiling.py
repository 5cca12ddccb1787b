"""Profiling & observability (SURVEY.md §5 — absent in the reference).

* :func:`timed` — ``block_until_ready``-bracketed wall timers with rays/s
  derivation (the BASELINE metric is rays/s/chip, so the counter is
  first-class).
* :func:`trace` — ``jax.profiler`` trace context producing Perfetto/
  TensorBoard traces.
* :class:`Meter` — rolling per-step metric aggregation for the training
  loop's structured log lines (loss, PSNR, rays/s, step time).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Callable, Dict, Optional

import jax

logger = logging.getLogger(__name__)


def timed(fn: Callable, *args, iters: int = 5, warmup: int = 1,
          rays: Optional[int] = None, label: str = "") -> Dict[str, float]:
    """Median wall time of ``fn(*args)`` with device sync; optional rays/s."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    out = {"median_s": med, "min_s": times[0], "max_s": times[-1]}
    if rays:
        out["rays_per_s"] = rays / med
    if label:
        msg = f"{label}: {med * 1e3:.2f} ms"
        if rays:
            msg += f" ({rays / med / 1e6:.2f}M rays/s)"
        logger.info(msg)
    return out


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rtgs_tpu_trace"):
    """``jax.profiler`` trace context (view in Perfetto/TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", logdir)


class Meter:
    """Rolling aggregation of scalar metrics for periodic structured logs."""

    def __init__(self):
        self._sums: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}
        self._t0 = time.perf_counter()
        self._steps = 0

    def update(self, **metrics: float) -> None:
        self._steps += 1
        for k, v in metrics.items():
            self._sums[k] = self._sums.get(k, 0.0) + float(v)
            self._counts[k] = self._counts.get(k, 0) + 1

    def flush(self, step: int, rays_per_step: Optional[int] = None) -> str:
        dt = time.perf_counter() - self._t0
        per_step = dt / max(self._steps, 1)
        parts = [f"step {step}", f"{per_step * 1e3:.1f} ms/step"]
        if rays_per_step:
            parts.append(
                f"{rays_per_step * self._steps / dt / 1e6:.2f}M rays/s")
        for k in sorted(self._sums):
            parts.append(f"{k}={self._sums[k] / self._counts[k]:.5g}")
        line = " ".join(parts)
        logger.info(line)
        self._sums.clear()
        self._counts.clear()
        self._steps = 0
        self._t0 = time.perf_counter()
        return line
