"""From-scratch fit WITH adaptive density control on real hardware
(VERDICT r4 weak #4 / next #4): seed ~10k points, densify toward ~100k
over >=1k steps at 512x384, and record the PSNR curve, per-step time,
every capacity growth, and the recompile count. This exercises the part
of the solver with real failure modes — capacity growth, recompiles,
per-slot Adam-moment surgery — at production scale on chip, which the
recovery-protocol ``fitbench.py`` never does.

Protocol (self-supervised; no external dataset ships in this image):
render ground-truth views of a structured 100k scene, then fit a model
initialized from a 10k random subsample of the GT means (the same
SfM-like seeding as ``rtgs-tpu fit --from-scratch``,
``rtgs_tpu/__main__.py:264``) with clone/split/prune enabled.
Reference contract: ``/root/reference/src/rtgs/solver.py:22-42`` (its
stub names exactly this loop) and the 3DGS adaptive-density recipe its
``rasterizer.py:47-71`` gestures at.

At the end the fitted scene is written to a ``.ply`` and RELOADED
through the standard loader as a round-trip check.

Usage: python scripts/fitscratch.py [--steps 1500] [--seed-points 10000]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt-n", type=int, default=100_000)
    ap.add_argument("--seed-points", type=int, default=10_000)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--res", type=str, default="512,384")
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--cand", type=int, default=1536)
    ap.add_argument("--renderer", type=str, default="keys")
    ap.add_argument("--densify-every", type=int, default=100)
    ap.add_argument("--densify-grad-threshold", type=float, default=1.5e-4)
    ap.add_argument("--max-live", type=int, default=150_000,
                    help="stop densifying once live exceeds this (the "
                    "6e-5-threshold stress run grew 10k->616k unchecked "
                    "and destabilized after growth stopped)")
    ap.add_argument("--out", type=str, default="/tmp/fitscratch.ply")
    args = ap.parse_args()
    res = tuple(int(x) for x in args.res.split(","))

    from rtgs_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    from rtgs_tpu.config import TrainConfig
    from rtgs_tpu.scene import load_scene, random_scene, save_scene
    from rtgs_tpu.train.datasets import synthetic_orbit_dataset
    from rtgs_tpu.train.solver import Solver, init_params_from_points

    render_kw = dict(max_candidates=args.cand, max_global=128)
    print(f"backend={jax.default_backend()} gt={args.gt_n} "
          f"seed={args.seed_points} res={res} views={args.views} "
          f"steps={args.steps} renderer={args.renderer}")

    key = jax.random.PRNGKey(0)
    gt = random_scene(key, args.gt_n, extent=2.0, scale_range=(0.005, 0.03))
    jax.block_until_ready(gt)
    t0 = time.time()
    ds = synthetic_orbit_dataset(
        gt, args.views, res, fov=60.0, radius=5.0, depth=args.depth,
        renderer=args.renderer, **render_kw)
    print(f"dataset: {args.views} GT views in {time.time() - t0:.0f}s")

    # SfM-like seeding: random subsample of the GT means (+ its colors).
    rng = np.random.default_rng(0)
    idx = rng.choice(args.gt_n, size=args.seed_points, replace=False)
    params = init_params_from_points(
        None, jnp.asarray(np.asarray(gt.means)[idx]),
        colors=jnp.asarray(np.asarray(gt.colors)[idx]))
    # Pad the seed to the capacity multiple with dead slots so step one
    # compiles at a clean shape; all later capacities come from _grow.
    cap0 = -(-args.seed_points // 256) * 256
    pad = cap0 - args.seed_points
    if pad:
        params = jax.tree.map(
            lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)),
            params)
        params = params._replace(
            quats=params.quats.at[args.seed_points:, 3].set(1.0),
            opacity_logits=params.opacity_logits.at[
                args.seed_points:].set(-10.0))
    mask = (jnp.arange(cap0) < args.seed_points).astype(jnp.float32)

    cfg = TrainConfig(
        iterations=args.steps,
        densify_from=args.densify_every,
        densify_until=args.steps - 200,   # settle before the final eval
        densify_every=args.densify_every,
        densify_grad_threshold=args.densify_grad_threshold,
        opacity_reset_every=0,            # short-run recipe: no resets
        checkpoint_every=0,
    )
    solver = Solver(params=params, mask=mask, cfg=cfg,
                    cameras=list(ds.cameras), targets=list(ds.images),
                    depth=args.depth, renderer=args.renderer,
                    render_kwargs=render_kw)

    growths = []          # (step, old_cap, new_cap)
    orig_grow = solver._grow

    def traced_grow(min_extra):
        old = solver.mask.shape[0]
        orig_grow(min_extra)
        growths.append((solver.step, old, solver.mask.shape[0]))
    solver._grow = traced_grow

    psnr_curve = []       # (step, psnr, live)
    step_times = []       # wall s, steady-state only (no densify/growth)
    t_fit0 = time.time()
    for i in range(args.steps):
        cap_before = solver.mask.shape[0]
        t0 = time.perf_counter()
        metrics = solver.train_step()
        jax.block_until_ready(solver.params.means)
        dt = time.perf_counter() - t0
        densified = (solver.step % cfg.densify_every == 0
                     and cfg.densify_from <= solver.step <= cfg.densify_until)
        if solver.num_live >= args.max_live and cfg.densify_until > 0:
            cfg.densify_until = 0          # growth target reached
            print(f"step {solver.step}: live={solver.num_live} >= "
                  f"{args.max_live}, densification stopped")
        if not densified and solver.mask.shape[0] == cap_before and i > 1:
            step_times.append(dt)
        if solver.step % 50 == 0 or solver.step == 1:
            psnr_curve.append((solver.step, round(metrics["psnr"], 2),
                               solver.num_live))
            print(f"step {solver.step}: loss={metrics['loss']:.5f} "
                  f"psnr={metrics['psnr']:.2f} live={solver.num_live} "
                  f"cap={solver.mask.shape[0]} {dt*1e3:.0f}ms")
    t_fit = time.time() - t_fit0

    # Recompiles = one trace per distinct capacity seen by the jitted step.
    recompiles = 1 + len(growths)
    med = float(np.median(step_times)) if step_times else float("nan")

    save_scene(args.out, solver.scene())
    reloaded = load_scene(args.out)
    n_live = solver.num_live
    assert reloaded.num >= n_live, (reloaded.num, n_live)
    print(f"saved {args.out}: {reloaded.num} splats reload OK")

    out = {
        "protocol": "from-scratch + densification",
        "backend": jax.default_backend(),
        "gt_n": args.gt_n, "seed_points": args.seed_points,
        "steps": args.steps, "views": args.views, "res": list(res),
        "final_psnr": psnr_curve[-1][1], "final_live": n_live,
        "capacity_growths": growths, "recompiles": recompiles,
        "median_step_ms": round(med * 1e3, 1),
        "total_fit_s": round(t_fit, 1),
        "psnr_curve": psnr_curve,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
