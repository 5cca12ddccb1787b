"""Generate golden parity fixtures by executing the REFERENCE's own code.

Runs ``/root/reference/src/rtgs``'s ``gaussian.py`` / ``ray.py`` /
``utils/quaternion.py`` unmodified under the float64 numpy Taichi shim
(``ti_shim.py``) and re-enacts the renderer loop exactly as written:

  * loader activations      — scene.py:101-114 (quat reorder [1,2,3,0] +
    normalize, exp(scale)·g, sigmoid colors/opacity),
  * SH upload semantics     — scene.py:106-107,122-128: the (N, 3, 15)
    reshape pushed into a (N, 15)-vec3 field is a flat C-order buffer
    reinterpretation, so coefficient j = f_rest[3j : 3j+3] ("flat" layout),
  * camera rays             — camera.py:31-71 (pixel centers, −z forward),
  * nearest-hit accept rule — scene.py:429-437 (t1 ∈ (start, end) open,
    nearest t1 wins; brute force here — the BVH only accelerates),
  * peel loop               — ray_tracer.py:79-104 (midpoint eval,
    T·α·rgb accumulate, start = t1 + 1e−8 advance, depth layers).

Fixtures written (committed; tests never import the reference):
  golden_fixture.npz   — 64×48 render of the reference's 16-splat
                         tests/data/test.ply (vendored as ref_test.ply)
  golden_synth.npz     — 64×48 render of a 120-splat synthetic scene
                         (written to synthetic120.ply with the inverse
                         activations, exercising SH degrees 1–3)
  golden_grads.npz     — central-difference gradients (f64, ε=1e-5) of a
                         fixed randomly-weighted image loss on the 16-splat
                         scene w.r.t. activated parameters (means, scales,
                         colors, opacities, SH, quat-with-renormalize)

Usage:  python tests/golden/gen_golden.py          (~2-4 min, CPU only)
"""

from __future__ import annotations

import math
import pathlib
import struct
import sys

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))

from ti_shim import Vec, install, install_full  # noqa: E402

ref_gaussian, ref_ray, ref_quat = install()
ref_scene, ref_camera, ref_ray_tracer = install_full()

REF_PLY = pathlib.Path("/root/reference/tests/data/test.ply")
DEPTH = 16
RES = (64, 48)
FOV_DEG = 60.0
# 16-splat fixture: splats live in [-0.7,1.4]×[-0.35,0.3]×[-4.6,1.3] with
# tiny scales (max σ 0.07) — at global scale 1 almost no pixel is touched.
# Use the reference's own --scale flag semantics (scene.py:112) to fatten
# them: scale 40 at this camera lights ~40% of pixels with both hits and
# misses.
CAM_POS_FIX = np.array([0.3, 0.0, 4.0])
FIXTURE_SCALE = 40.0
CAM_POS_SYN = np.array([0.0, 0.0, 4.0])
CAM_ROT = np.array([0.0, 0.0, 0.0, 1.0])  # identity, looking −z
EPS_FD = 1e-5


# --------------------------------------------------------------------------
# Standalone PLY I/O (independent of rtgs_tpu.io.ply on purpose).
# --------------------------------------------------------------------------

PROPS = (["x", "y", "z", "nx", "ny", "nz"]
         + [f"f_dc_{i}" for i in range(3)]
         + [f"f_rest_{i}" for i in range(45)]
         + ["opacity"]
         + [f"scale_{i}" for i in range(3)]
         + [f"rot_{i}" for i in range(4)])


def read_ply(path):
    data = path.read_bytes()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii")
    n = None
    names = []
    for line in header.splitlines():
        parts = line.split()
        if parts[:2] == ["element", "vertex"]:
            n = int(parts[2])
        elif parts and parts[0] == "property":
            names.append(parts[2])
    assert "binary_little_endian" in header
    body = np.frombuffer(data, dtype="<f4", count=n * len(names), offset=end)
    body = body.reshape(n, len(names)).astype(np.float64)
    return {name: body[:, i] for i, name in enumerate(names)}


def write_ply(path, cols):
    n = len(cols["x"])
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {p}" for p in PROPS]
    header += ["end_header", ""]
    body = np.stack([cols[p] for p in PROPS], axis=1).astype("<f4")
    path.write_bytes("\n".join(header).encode("ascii") + body.tobytes())


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def activate(cols, scale=1.0):
    """scene.py:101-114 activations; returns dict of activated params with
    SH in the flat-triple layout (see module docstring)."""
    n = len(cols["x"])
    means = np.stack([cols["x"], cols["y"], cols["z"]], 1)
    quats = np.stack([cols["rot_1"], cols["rot_2"], cols["rot_3"],
                      cols["rot_0"]], 1)
    quats = quats / np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = np.exp(np.stack([cols[f"scale_{i}"] for i in range(3)], 1)) * scale
    colors = sigmoid(np.stack([cols[f"f_dc_{i}"] for i in range(3)], 1))
    opac = sigmoid(cols["opacity"])
    frest = np.stack([cols[f"f_rest_{i}"] for i in range(45)], 1)
    sh = frest.reshape(n, 15, 3)  # flat reinterpretation (scene.py:122,127)
    return dict(means=means, quats=quats, scales=scales, colors=colors,
                opacities=opac, sh=sh)


SH_NAMES = ["sh_10", "sh_11", "sh_12", "sh_20", "sh_21", "sh_22", "sh_23",
            "sh_24", "sh_30", "sh_31", "sh_32", "sh_33", "sh_34", "sh_35",
            "sh_36"]


def build_gaussians(p):
    """Instantiate reference Gaussian structs (scene.py:133-159 semantics)."""
    gs = []
    for i in range(len(p["opacities"])):
        g = ref_gaussian.new_gaussian(
            Vec(p["means"][i]), Vec(p["quats"][i]), Vec(p["scales"][i]),
            Vec(p["colors"][i]), float(p["opacities"][i]))
        for j, name in enumerate(SH_NAMES):
            setattr(g, name, Vec(p["sh"][i, j]))
        gs.append(g)
    return gs


def render_reference_stack(ply_path, scale=1.0, res=RES, depth=DEPTH,
                           cam_pos=CAM_POS_SYN, cam_rot=CAM_ROT,
                           fov_deg=FOV_DEG, bvh_nodes=256):
    """Execute the reference's OWN loader + renderer stack end-to-end
    under the field-emulating shim (VERDICT r2 missing #4):
    ``Scene(bvh, 4, 16)`` + ``load_file`` (__main__.py:98-99, including
    the full SAH BVH build), ``Camera.generate_ray_field``
    (camera.py:57-71), and ``RayTracer.sample`` × depth
    (ray_tracer.py:39-104) — with the real 32-slot-stack BVH traversal
    (scene.py:406-450), not a brute-force stand-in."""
    import taichi as ti

    from rtgs.utils.types import vec2i

    scene = ref_scene.Scene(bvh_nodes, 4, 16)
    scene.load_file(pathlib.Path(ply_path), scale)

    w, h = res
    focal = (h / 2.0) / math.tan(fov_deg * math.pi / 360.0)  # __main__:90-92
    camera = ref_camera.Camera(
        Vec(cam_pos), Vec(cam_rot), vec2i(w, h),
        ti.math.vec2(focal, focal))
    tracer = ref_ray_tracer.RayTracer(vec2i(w, h), scene, camera)
    tracer.clear_sample()
    for _ in range(depth):
        tracer.sample(depth)
    assert tracer.num_samples == 1 and tracer.num_steps == 0
    return tracer.sample_buf.to_numpy()  # (w, h, 3)


def render(p, res=RES, depth=DEPTH, cam_pos=CAM_POS_SYN, cam_rot=CAM_ROT,
           fov_deg=FOV_DEG):
    """Reference render loop: ray_tracer.py:39-104 on brute-force hits.
    (Used for the finite-difference gradient fixtures, which need
    activated-parameter perturbations; the image fixtures go through
    :func:`render_reference_stack` instead.)"""
    gs = build_gaussians(p)
    w, h = res
    focal = (h / 2.0) / math.tan(fov_deg * math.pi / 360.0)  # __main__.py:90-92
    rot = Vec(cam_rot)
    img = np.zeros((w, h, 3))
    for i in range(w):
        for j in range(h):
            # camera.py:57-71: pixel-center uv; camera.py:31-55 projection.
            px = (w * ((i + 0.5) / w) - 0.5 * w) / focal
            py = (h * ((j + 0.5) / h) - 0.5 * h) / focal
            d_cam = Vec([px, py, -1.0])
            d_cam = d_cam / np.linalg.norm(d_cam)
            d_world = ref_quat.rot_vec3(rot, d_cam)
            ray = ref_ray.new_ray(Vec(cam_pos), Vec(d_world), 0.0, math.inf)

            sample = np.zeros(3)
            atten = 1.0
            for _ in range(depth):
                # Brute-force Scene.hit (scene.py:429-437 accept rule).
                best_t = math.inf
                best = None
                for g in gs:
                    inter = g.hit(ray)
                    if ray.start < inter.x < ray.end and inter.x < best_t:
                        best_t = inter.x
                        best = (g, inter)
                if best is None:
                    break  # start = inf (ray_tracer.py:104); nothing more
                g, inter = best
                eval_t = (inter.x + inter.y) / 2.0      # ray_tracer.py:90
                if math.isinf(eval_t):
                    alpha = 0.0                          # Δ==0 quirk: ρ→0
                else:
                    eval_pos = ray.get(eval_t)
                    ev = g.eval(eval_pos, ray.direction)  # gaussian.py:183
                    sample = sample + atten * ev.w * np.asarray(ev.xyz)
                    alpha = ev.w
                atten *= 1.0 - alpha
                ray.start = inter.x + 1e-8               # ray_tracer.py:100
            img[i, j] = sample
    return img


def synthetic_scene(n=120, seed=7):
    rng = np.random.default_rng(seed)
    cols = {p: np.zeros(n) for p in PROPS}
    pos = rng.normal(0.0, 0.7, (n, 3))
    for k, name in enumerate(["x", "y", "z"]):
        cols[name] = pos[:, k]
    quat_sf = rng.normal(0.0, 1.0, (n, 4))  # scalar-first in the file
    for k in range(4):
        cols[f"rot_{k}"] = quat_sf[:, k]
    for k in range(3):
        cols[f"scale_{k}"] = np.log(rng.uniform(0.04, 0.15, n))
    logit = lambda y: np.log(y) - np.log1p(-y)  # noqa: E731
    for k in range(3):
        cols[f"f_dc_{k}"] = logit(rng.uniform(0.2, 0.9, n))
    cols["opacity"] = logit(rng.uniform(0.3, 0.95, n))
    for k in range(45):
        cols[f"f_rest_{k}"] = rng.normal(0.0, 0.08, n)
    return cols


def pick_visible(p, cam_pos, k=6):
    """Heuristic visibility rank: in-frustum centers weighted by opacity and
    projected size — good enough to aim FD probes at live gradient paths."""
    d = p["means"] - cam_pos[None, :]
    z = -d[:, 2]
    ok = z > 0.2
    size = p["scales"].max(1) / np.maximum(z, 0.2)
    score = np.where(ok, p["opacities"] * size, -1.0)
    return np.argsort(-score)[:k]


def fd_gradients(p, weights, probes, cam_pos):
    """Central differences of L = Σ weights·img w.r.t. activated params."""
    def loss(pp):
        return float(np.sum(weights * render(pp, res=(32, 24),
                                             cam_pos=cam_pos)))

    grads = []
    for field, idx in probes:
        pp = {k: v.copy() for k, v in p.items()}
        if field == "quat_renorm":
            # Perturb one raw component, renormalize — matches the JAX-side
            # loss(normalize(q)) composition in the test.
            gi, ci = idx
            base = p["quats"][gi].copy()
            pert = base.copy()
            pert[ci] += EPS_FD
            pp["quats"][gi] = pert / np.linalg.norm(pert)
            up = loss(pp)
            pert = base.copy()
            pert[ci] -= EPS_FD
            pp["quats"][gi] = pert / np.linalg.norm(pert)
            dn = loss(pp)
        else:
            flat = pp[field].reshape(-1)
            flat[idx] += EPS_FD
            up = loss(pp)
            flat[idx] -= 2 * EPS_FD
            dn = loss(pp)
        grads.append((up - dn) / (2 * EPS_FD))
    return np.asarray(grads)


def main():
    # 1. Vendor the reference fixture + golden render — through the
    # reference's own loader + BVH + traversal + peel loop.
    (HERE / "ref_test.ply").write_bytes(REF_PLY.read_bytes())
    img16 = render_reference_stack(
        REF_PLY, scale=FIXTURE_SCALE, cam_pos=CAM_POS_FIX)
    np.savez(HERE / "golden_fixture.npz",
             img=img16.astype(np.float32), res=np.array(RES),
             depth=DEPTH, cam_pos=CAM_POS_FIX, cam_rot=CAM_ROT,
             fov_deg=FOV_DEG, scale=FIXTURE_SCALE)
    print(f"fixture: img range [{img16.min():.4f}, {img16.max():.4f}], "
          f"nonzero px {(np.abs(img16).sum(-1) > 0).mean():.1%}")

    # 2. Synthetic 120-splat scene, same full-stack execution.
    syn_cols = synthetic_scene()
    write_ply(HERE / "synthetic120.ply", syn_cols)
    psyn = activate(read_ply(HERE / "synthetic120.ply"))  # f32 round-trip
    imgsyn = render_reference_stack(
        HERE / "synthetic120.ply", cam_pos=CAM_POS_SYN)
    np.savez(HERE / "golden_synth.npz",
             img=imgsyn.astype(np.float32), res=np.array(RES),
             depth=DEPTH, cam_pos=CAM_POS_SYN, cam_rot=CAM_ROT,
             fov_deg=FOV_DEG)
    print(f"synth:   img range [{imgsyn.min():.4f}, {imgsyn.max():.4f}], "
          f"nonzero px {(np.abs(imgsyn).sum(-1) > 0).mean():.1%}")

    # 3. FD gradients on the synthetic scene at 32×24, aimed at visible
    # Gaussians (the 16-splat fixture is too sparse — probes all land on
    # dead pixels).
    rng = np.random.default_rng(11)
    weights = rng.uniform(0.1, 1.0, (32, 24, 3))
    vis = pick_visible(psyn, CAM_POS_SYN, k=6)
    g0, g1, g2, g3, g4, g5 = (int(v) for v in vis)
    probes = [
        ("means", g0 * 3 + 0), ("means", g1 * 3 + 1), ("means", g2 * 3 + 2),
        ("scales", g0 * 3 + 1), ("scales", g3 * 3 + 0),
        ("colors", g1 * 3 + 0),
        ("opacities", g2), ("opacities", g4),
        ("sh", (g3 * 15 + 4) * 3 + 1), ("sh", (g5 * 15 + 12) * 3 + 2),
        ("quat_renorm", (g4, 0)), ("quat_renorm", (g5, 2)),
    ]
    fd = fd_gradients(psyn, weights, probes, CAM_POS_SYN)
    np.savez(HERE / "golden_grads.npz",
             fd=fd, weights=weights.astype(np.float32),
             probe_fields=np.array([f for f, _ in probes]),
             probe_idx=np.array([i if isinstance(i, int) else -1
                                 for _, i in probes]),
             probe_quat=np.array([i if isinstance(i, tuple) else (-1, -1)
                                  for _, i in probes]),
             depth=DEPTH, fov_deg=FOV_DEG, cam_pos=CAM_POS_SYN,
             cam_rot=CAM_ROT)
    for (f, i), v in zip(probes, fd):
        print(f"fd {f}[{i}] = {v:+.6e}")


if __name__ == "__main__":
    main()
