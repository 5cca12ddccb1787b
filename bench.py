"""Benchmark harness: one JSON line for the driver.

Headline metric (BASELINE.json): forward+backward rays/s on one chip at a
1M-Gaussian scene, 1080p, depth 16. Baseline: the reference's derived
throughput of ~0.49M full 16-deep rays/s (BASELINE.md — 960×540 @ 15 FPS,
one peel per frame).

Uses the fused Pallas renderer (the production path). The tunneled-TPU
remote compiler is slow for large XLA graphs, so the harness (a) enables the
persistent compilation cache, (b) keeps the graph small (binning + kernel),
and (c) falls back to smaller configurations on failure, reporting which
configuration ran.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_RAYS_PER_S = 0.49e6  # reference, full 16-deep rays/s (BASELINE.md)


def _build(n_gauss, res, seed=0):
    import numpy as np
    import jax

    from rtgs_tpu.camera import camera_from_fov
    from rtgs_tpu.scene import random_scene
    from rtgs_tpu.viewer.orbit import orbit_camera_pose

    key = jax.random.PRNGKey(seed)
    g = random_scene(key, n_gauss, extent=2.0, scale_range=(0.005, 0.03))
    pos, rot, _, _ = orbit_camera_pose(
        0.4, 1.2, 5.0, np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0]))
    cam = camera_from_fov(pos, rot, res, 60.0)
    return g, cam


def _time(fn, iters=5):
    import jax

    jax.block_until_ready(fn())  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from rtgs_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from rtgs_tpu.render.tiled import render_tiled_pallas

    configs = [
        dict(n=1_000_000, res=(1920, 1088), depth=16, label="1M@1080p"),
        dict(n=250_000, res=(1280, 720), depth=16, label="250k@720p"),
        dict(n=100_000, res=(640, 384), depth=16, label="100k@384p"),
    ]
    render_kw = dict(tile=(16, 16), max_candidates=512, max_global=128)

    result = None
    for cfg in configs:
        try:
            g, cam = _build(cfg["n"], cfg["res"])
            rays = cfg["res"][0] * cfg["res"][1]

            def fwd():
                return render_tiled_pallas(
                    g, cam, depth=cfg["depth"], **render_kw)

            t_fwd = _time(fwd)

            @jax.jit
            def grad_fn(gg):
                def loss(gg):
                    return jnp.sum(render_tiled_pallas(
                        gg, cam, depth=cfg["depth"], **render_kw))

                return jax.grad(loss)(gg)

            try:
                t_fwdbwd = _time(lambda: grad_fn(g))
                mode = "fwd+bwd"
                t = t_fwdbwd
            except Exception as e:
                print(f"# bwd failed ({type(e).__name__}: {e}); "
                      "reporting fwd only", file=sys.stderr)
                mode, t = "fwd", t_fwd

            value = rays / t
            result = {
                "metric": "rays_per_s",
                "value": round(value, 1),
                "unit": f"rays/s ({mode}, {cfg['label']}, depth 16, 1 chip)",
                "vs_baseline": round(value / BASELINE_RAYS_PER_S, 3),
                "config": cfg["label"],
                "mode": mode,
                "fwd_ms": round(t_fwd * 1e3, 2),
                "step_ms": round(t * 1e3, 2),
                "device": str(jax.devices()[0]),
            }
            break
        except Exception as e:
            print(f"# config {cfg['label']} failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
            continue

    if result is None:
        result = {"metric": "rays_per_s", "value": 0.0, "unit": "rays/s",
                  "vs_baseline": 0.0, "error": "all configs failed"}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
