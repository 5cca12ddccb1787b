"""Command-line interface.

The reference ships an interactive ``ti.GUI`` viewer driven by the same flags
(``/root/reference/src/rtgs/__main__.py:31-258``); on a TPU host there is no
windowing, so the CLI exposes:

  * ``render`` — render one frame from the orbit-camera home pose (the exact
    pose the reference viewer starts at) to a PNG,
  * ``orbit``  — render a turntable sweep (N frames around the scene),
  * ``bench``  — quick rays/s measurement on the current backend,
  * ``serve``  — interactive browser viewer (orbit camera over HTTP).

Flag names and semantics mirror the reference argparse
(``__main__.py:38-84``): ``-o/--open``, ``-r/--res W,H``, ``-f/--fov``,
``-s/--sample``, ``-d/--depth``, ``--scale``; ``LOG_LEVEL`` env controls
logging (``__main__.py:17-26``).
"""

from __future__ import annotations

import argparse
import logging
import os
import pathlib
import sys
import time

import numpy as np


def _setup_logging():
    env_level = os.getenv("LOG_LEVEL", "WARNING").upper()
    log_levels = {
        "DEBUG": logging.DEBUG,
        "INFO": logging.INFO,
        "WARNING": logging.WARNING,
        "ERROR": logging.ERROR,
        "CRITICAL": logging.CRITICAL,
    }
    logging.basicConfig(level=log_levels.get(env_level, logging.INFO))


def _add_common_flags(p: argparse.ArgumentParser):
    p.add_argument("-o", "--open", type=pathlib.Path, required=True,
                   help="Path to the .ply Gaussian splatting scene file.")
    def _res(s: str):
        parts = s.split(",")
        if len(parts) != 2:
            raise argparse.ArgumentTypeError(
                f"--res wants W,H (e.g. 960,540), got {s!r}")
        return (int(parts[0]), int(parts[1]))

    p.add_argument("-r", "--res", type=_res,
                   default=(960, 540), help="Render resolution W,H")
    p.add_argument("-f", "--fov", type=float, default=90.0,
                   help="Vertical FOV in degrees.")
    p.add_argument("-s", "--sample", type=int, default=1,
                   help="Render sample rate (deterministic renderer: all "
                        "samples identical, kept for flag parity).")
    p.add_argument("-d", "--depth", type=int, default=16,
                   help="Render sample depth (composited layers).")
    p.add_argument("--scale", type=float, default=1.0,
                   help="Global Gaussian scale.")
    p.add_argument("--renderer", choices=["auto", "oracle", "tiled"],
                   default="auto")
    p.add_argument("--radius", type=float, default=1.0,
                   help="Orbit camera radius (viewer zoom state).")
    p.add_argument("--theta", type=float, default=0.0)
    p.add_argument("--phi", type=float, default=None,
                   help="Orbit polar angle (default π/2).")


def _load(args):
    from rtgs_tpu.scene import load_scene

    return load_scene(args.open, scale=args.scale)


def _camera(args, theta, phi, r):
    import math

    from rtgs_tpu.camera import camera_from_fov
    from rtgs_tpu.viewer.orbit import OrbitState

    state = OrbitState(theta=theta, phi=phi if phi is not None else math.pi / 2,
                       r=r)
    pos, rot = state.camera_pose()
    return camera_from_fov(pos, rot, args.res, args.fov)


def _render(g, cam, args):
    from rtgs_tpu.render.api import render

    return render(g, cam, depth=args.depth, renderer=args.renderer)


def cmd_render(args):
    from rtgs_tpu.camera import image_to_display
    from rtgs_tpu.utils.image import save_image

    g = _load(args)
    cam = _camera(args, args.theta, args.phi, args.radius)
    t0 = time.time()
    img = np.asarray(_render(g, cam, args))
    dt = time.time() - t0
    out = args.output or (args.open.stem + ".png")
    save_image(out, np.asarray(image_to_display(img)))
    w, h = args.res
    print(f"Rendered {w}x{h} ({g.num} splats, depth {args.depth}) "
          f"in {dt:.2f}s -> {out}")


def cmd_orbit(args):
    from rtgs_tpu.camera import image_to_display
    from rtgs_tpu.utils.image import save_image

    g = _load(args)
    outdir = pathlib.Path(args.output or "orbit_frames")
    outdir.mkdir(parents=True, exist_ok=True)
    for i in range(args.frames):
        theta = args.theta + 2 * np.pi * i / args.frames
        cam = _camera(args, theta, args.phi, args.radius)
        img = _render(g, cam, args)
        save_image(outdir / f"frame_{i:04d}.png",
                   np.asarray(image_to_display(img)))
    print(f"Rendered {args.frames} orbit frames -> {outdir}/")


def cmd_bench(args):
    import jax

    g = _load(args)
    cam = _camera(args, args.theta, args.phi, args.radius)
    img = _render(g, cam, args)  # compile
    jax.block_until_ready(img)
    t0 = time.time()
    for _ in range(args.iters):
        img = _render(g, cam, args)
    jax.block_until_ready(img)
    dt = (time.time() - t0) / args.iters
    rays = args.res[0] * args.res[1]
    print(f"{rays / dt / 1e6:.2f}M rays/s ({dt * 1e3:.1f} ms/frame, "
          f"{g.num} splats, depth {args.depth})")


def cmd_serve(args):
    from rtgs_tpu.viewer.server import serve

    g = _load(args)
    serve(g, args)


def main(argv=None):
    _setup_logging()
    parser = argparse.ArgumentParser(
        "rtgs-tpu",
        description="TPU-native ray-traced 3D Gaussian splatting renderer.")
    sub = parser.add_subparsers(dest="command", required=True)

    p_render = sub.add_parser("render", help="Render a single frame to PNG.")
    _add_common_flags(p_render)
    p_render.add_argument("--output", type=str, default=None)
    p_render.set_defaults(func=cmd_render)

    p_orbit = sub.add_parser("orbit", help="Render an orbit turntable.")
    _add_common_flags(p_orbit)
    p_orbit.add_argument("--frames", type=int, default=12)
    p_orbit.add_argument("--output", type=str, default=None)
    p_orbit.set_defaults(func=cmd_orbit)

    p_bench = sub.add_parser("bench", help="Measure rays/s.")
    _add_common_flags(p_bench)
    p_bench.add_argument("--iters", type=int, default=10)
    p_bench.set_defaults(func=cmd_bench)

    p_serve = sub.add_parser("serve", help="Interactive browser viewer.")
    _add_common_flags(p_serve)
    p_serve.add_argument("--port", type=int, default=8000)
    p_serve.set_defaults(func=cmd_serve)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
