"""Self-contained quality benchmark: teacher -> dataset -> train -> PSNR.

The reference ships no benchmarks or checkpoints (SURVEY.md section 6), so
quality is tracked with a closed loop that exercises every subsystem:
  1. a synthetic "teacher" snapshot renders K training views,
  2. a student model trains from scratch on those views (the training
     capability the reference stubs out),
  3. the student's snapshot renders held-out views; PSNR vs the teacher's
     renders is the score.

Usage:
  python -m nerf_tpu.apps.eval_quality [--steps 300] [--res 64]
      [--views 8] [--out-json quality.json]
"""
from __future__ import annotations

import argparse
import json
import math
import time

import numpy as np

from nerf_tpu.core.snapshot import make_synthetic_snapshot
from nerf_tpu.core.types import Camera, RenderSettings
from nerf_tpu.models.nerf import build_nerf_network
from nerf_tpu.render.engine import NerfRender
from nerf_tpu.render.density_grid import generate_density_grid, mean_density
from nerf_tpu.render.rays import generate_rays, near_far_from_aabb
from nerf_tpu.train.trainer import Trainer
from nerf_tpu.utils.metrics import psnr
from nerf_tpu.utils import logging as nlog

STUDENT_CFG = {
    "loss": {"otype": "Huber"},
    "encoding": {"otype": "HashGrid", "n_levels": 8,
                 "n_features_per_level": 2, "log2_hashmap_size": 15,
                 "base_resolution": 16},
    "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                "output_activation": "None", "n_neurons": 64,
                "n_hidden_layers": 1},
    "dir_encoding": {"otype": "SphericalHarmonics", "degree": 4},
    "rgb_network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": 64,
                    "n_hidden_layers": 2},
}


def orbit_pose(angle: float, radius: float = 6.0) -> np.ndarray:
    """nerf-convention c2w orbiting the origin in the xz plane."""
    c, s = math.cos(angle), math.sin(angle)
    # camera looks along +z toward the origin (before ngp conversion)
    rot = np.array([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = rot
    pose[:3, 3] = rot @ np.array([0.0, 0.0, radius], np.float32)
    return pose


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--n-samples", type=int, default=64)
    p.add_argument("--grid-h", type=int, default=32)
    p.add_argument("--out-json", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--encoding", default="HashGrid",
                   choices=["HashGrid", "TpuGrid"],
                   help="student position encoding (TpuGrid = the "
                        "TPU-native brick-neighborhood grid; same "
                        "parameter budget)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    res = args.res
    cam = Camera(fl_x=res * 1.2, fl_y=res * 1.2, cx=res / 2, cy=res / 2)

    # 1. teacher renders
    teacher_snap = make_synthetic_snapshot(seed=3, grid_h=args.grid_h,
                                           network_config=STUDENT_CFG)
    teacher = NerfRender(settings=RenderSettings(density_scale=8.0))
    teacher.load_from_snapshot(teacher_snap)
    teacher.set_resolution((res, res))

    nlog.info("rendering %d teacher views at %dx%d", args.views + 2, res,
              res)
    angles = np.linspace(0, 2 * math.pi, args.views + 2, endpoint=False)
    views = []
    for a in angles:
        pose = orbit_pose(float(a))
        rgb, _, _ = teacher.render_frame_arrays(cam, pose)
        # displayable range: raw teacher MLP output can exceed [0,1]
        views.append((pose, np.clip(np.asarray(rgb, np.float32), 0.0, 1.0)))
    train_views, test_views = views[:args.views], views[args.views:]

    # 2. train the student on the teacher's renders
    settings = RenderSettings(density_scale=1.0, grid_h=args.grid_h)
    student_cfg = dict(STUDENT_CFG)
    if args.encoding == "TpuGrid":
        student_cfg["encoding"] = dict(STUDENT_CFG["encoding"],
                                       otype="TpuGrid")
    net = build_nerf_network(student_cfg, bound=1.0)
    key = jax.random.PRNGKey(args.seed)
    params = net.init_params(key)
    trainer = Trainer(net, settings, loss_config={"otype": "Huber"},
                      optimizer_config={"otype": "Adam",
                                        "learning_rate": 1e-2,
                                        "beta1": 0.9, "beta2": 0.99,
                                        "epsilon": 1e-15},
                      n_samples=args.n_samples)
    opt_state, ema = trainer.init_state(params)

    # flatten training rays (the camera path of the teacher)
    from nerf_tpu.render.rays import nerf_matrix_to_ngp

    all_o, all_d, all_rgb = [], [], []
    for pose, rgb in train_views:
        ngp = nerf_matrix_to_ngp(pose, settings.scale)
        o, d = generate_rays(cam, ngp[:3, :3], ngp[:3, 3], res, res)
        all_o.append(np.asarray(o))
        all_d.append(np.asarray(d))
        all_rgb.append(rgb)
    all_o = np.concatenate(all_o)
    all_d = np.concatenate(all_d)
    all_rgb = np.concatenate(all_rgb)
    aabb = jnp.asarray(settings.aabb, jnp.float32)

    rng = np.random.default_rng(args.seed)
    t0 = time.perf_counter()
    for step in range(args.steps):
        idx = rng.integers(0, all_o.shape[0], args.batch)
        o = jnp.asarray(all_o[idx])
        d = jnp.asarray(all_d[idx])
        nears, fars = near_far_from_aabb(o, d, aabb, settings.min_near)
        params, opt_state, ema, loss = trainer.step(
            params, opt_state, ema, (o, d, nears, fars,
                                     jnp.asarray(all_rgb[idx])),
            jax.random.fold_in(key, step))
        if step % 100 == 0 or step == args.steps - 1:
            nlog.info("step %d loss %.5f", step, float(loss))
    nlog.info("trained %d steps in %.1fs", args.steps,
              time.perf_counter() - t0)

    # 3. build the student's occupancy grid + render held-out views
    final = ema if ema is not None else params
    grid = jnp.full((settings.grid_h ** 3,), 0.0, jnp.float32)
    grid = generate_density_grid(net, final, grid, settings,
                                 key=jax.random.fold_in(key, 999),
                                 scale_const=1.0)
    md = float(mean_density(grid))

    student = NerfRender(settings=RenderSettings(
        density_scale=1.0, grid_h=settings.grid_h, mean_density=md))
    student.network = net
    student.params = final
    student.density_grid = grid
    student.set_resolution((res, res))

    scores = []
    for pose, target in test_views:
        rgb, _, _ = student.render_frame_arrays(cam, pose)
        scores.append(psnr(np.clip(np.asarray(rgb), 0, 1),
                           np.clip(target, 0, 1)))
    result = {"psnr_mean": float(np.mean(scores)),
              "psnr_per_view": [float(s) for s in scores],
              "steps": args.steps, "res": res,
              "encoding": args.encoding}
    nlog.info("held-out PSNR: %.2f dB", result["psnr_mean"])
    print(json.dumps(result))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
