"""Train the flagship on a procedural SHARP scene (the bench scene).

VERDICT r2 items 4/6/7: the round-2 bench scene was a soft synthetic
sphere whose density ramp forced ~13.5 samples/ray (trained sharp scenes
sit at 2-5); and the quality records were 48x48 toys. This script renders
an ANALYTIC scene (hard-surfaced sphere + box, lambertian shading, white
background) as ground truth, trains a student from scratch with the
in-repo Trainer, reports held-out PSNR, and saves a reference-layout
msgpack snapshot that bench.py uses as its representative scene.

Usage (run on the TPU; CPU works but is slow):
  python scripts/train_sharp_scene.py --encoding tpugrid --steps 3000 \
      --out assets/sharp_tpugrid.msgpack --record quality_sharp.json
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# Analytic scene (ngp coordinates, everything inside |x| < 0.8)
# ---------------------------------------------------------------------------

_SPHERE_C = np.array([0.32, 0.05, 0.10], np.float32)
_SPHERE_R = 0.30
_SPHERE_COL = np.array([0.85, 0.25, 0.20], np.float32)
# box spans the origin so the bench's center-ray validation (straight
# through ngp (0,*,0)) hits geometry from any orbit angle
_BOX_C = np.array([-0.20, -0.05, -0.10], np.float32)
_BOX_H = 0.25
_BOX_COL = np.array([0.20, 0.35, 0.85], np.float32)
_LIGHT = np.array([0.4, 0.8, 0.45], np.float32)
_LIGHT = _LIGHT / np.linalg.norm(_LIGHT)
_BG = 1.0


def trace_scene(rays_o: np.ndarray, rays_d: np.ndarray) -> np.ndarray:
    """Hard-surface ray trace -> rgb [N, 3] (float in [0,1])."""
    n = rays_o.shape[0]
    t_best = np.full(n, np.inf, np.float32)
    rgb = np.full((n, 3), _BG, np.float32)

    # sphere
    oc = rays_o - _SPHERE_C
    b = np.sum(oc * rays_d, axis=1)
    c = np.sum(oc * oc, axis=1) - _SPHERE_R ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 1e-3
    nrm = (rays_o + t[:, None] * rays_d - _SPHERE_C) / _SPHERE_R
    lam = np.clip(nrm @ _LIGHT, 0, 1) * 0.7 + 0.3
    upd = hit & (t < t_best)
    t_best = np.where(upd, t, t_best)
    rgb = np.where(upd[:, None], _SPHERE_COL[None, :] * lam[:, None], rgb)

    # axis-aligned box (slab test)
    inv = 1.0 / np.where(np.abs(rays_d) > 1e-9, rays_d, 1e-9)
    t0 = (_BOX_C - _BOX_H - rays_o) * inv
    t1 = (_BOX_C + _BOX_H - rays_o) * inv
    tmin = np.max(np.minimum(t0, t1), axis=1)
    tmax = np.min(np.maximum(t0, t1), axis=1)
    bhit = (tmax > tmin) & (tmin > 1e-3)
    p = rays_o + tmin[:, None] * rays_d
    rel = (p - _BOX_C) / _BOX_H
    ax = np.argmax(np.abs(rel), axis=1)
    nrm_b = np.zeros((n, 3), np.float32)
    nrm_b[np.arange(n), ax] = np.sign(rel[np.arange(n), ax])
    lam_b = np.clip(nrm_b @ _LIGHT, 0, 1) * 0.7 + 0.3
    updb = bhit & (tmin < t_best)
    t_best = np.where(updb, tmin, t_best)
    rgb = np.where(updb[:, None], _BOX_COL[None, :] * lam_b[:, None], rgb)
    return rgb


def orbit_pose(angle: float, elev: float = 0.25,
               radius: float = 6.0) -> np.ndarray:
    c, s = math.cos(angle), math.sin(angle)
    ce, se = math.cos(elev), math.sin(elev)
    rot_y = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
    rot_x = np.array([[1, 0, 0], [0, ce, -se], [0, se, ce]], np.float32)
    rot = rot_y @ rot_x
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = rot
    pose[:3, 3] = rot @ np.array([0.0, 0.0, radius], np.float32)
    return pose


ENCODINGS = {
    "tpugrid": {"otype": "TpuGrid", "n_levels": 16,
                "n_features_per_level": 2, "log2_hashmap_size": 19,
                "base_resolution": 16},
    # 4^3-brick quality rows: ~1.7x unique cells at equal params for a
    # 1.58x encode cost (scripts/bench_brick4.py, BASELINE r4)
    "tpugrid4": {"otype": "TpuGrid", "n_levels": 16,
                 "n_features_per_level": 2, "log2_hashmap_size": 19,
                 "base_resolution": 16, "brick_w": 4},
    "hashgrid": {"otype": "HashGrid", "n_levels": 16,
                 "n_features_per_level": 2, "log2_hashmap_size": 19,
                 "base_resolution": 16},
    # f4 rows: 8 levels x 4 features — half the gather descriptors per
    # sample at the same 32-dim output (measured 1.3x encode speed,
    # BASELINE r3); the head-to-head says whether quality holds
    "tpugrid_f4": {"otype": "TpuGrid", "n_levels": 8,
                   "n_features_per_level": 4, "log2_hashmap_size": 19,
                   "base_resolution": 16},
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--encoding", choices=sorted(ENCODINGS), default="tpugrid")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--n-samples", type=int, default=128)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--views", type=int, default=24)
    p.add_argument("--brick-reg", type=float, default=0.0)
    p.add_argument("--project-every", type=int, default=0,
                   help="hard brick-boundary sharing: project duplicated "
                        "dense-level cells to their mean every N steps")
    p.add_argument("--log2-rows", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--grid-update-every", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="msgpack snapshot path")
    p.add_argument("--record", default=None, help="json record path")
    p.add_argument("--eval-res", type=int, default=128)
    p.add_argument("--gt-ss", type=int, default=1,
                   help="supersample the analytic GT ss^2 rays/pixel "
                        "(band-limited targets: a 1-ray/pixel hard-edge "
                        "trace is pathologically aliased and caps PSNR "
                        "near ~20 dB at the edges regardless of model "
                        "capacity; real-photo GT is integrated over the "
                        "pixel by the camera optics)")
    p.add_argument("--eval-ss", type=int, default=0,
                   help="render eval views at ss x resolution and "
                        "box-filter (matches the supersampled GT's "
                        "band limit); 0 = same as --gt-ss")
    p.add_argument("--log-every", type=int, default=200)
    args = p.parse_args(argv)

    from nerf_tpu.utils.compile_cache import enable as enable_cache

    enable_cache(os.path.join(REPO, ".xla_cache"))

    import jax
    import jax.numpy as jnp

    from nerf_tpu.core.snapshot import DEFAULT_NETWORK_CONFIG, save_snapshot
    from nerf_tpu.core.types import Camera, RenderSettings
    from nerf_tpu.models.nerf import build_nerf_network
    from nerf_tpu.render.density_grid import (
        generate_density_grid,
        mean_density,
    )
    from nerf_tpu.render.rays import (
        generate_rays,
        near_far_from_aabb,
        nerf_matrix_to_ngp,
    )
    from nerf_tpu.train.trainer import Trainer
    from nerf_tpu.utils.metrics import psnr

    cfg = dict(DEFAULT_NETWORK_CONFIG)
    cfg["encoding"] = dict(ENCODINGS[args.encoding])
    if args.log2_rows is not None:
        cfg["encoding"]["log2_rows"] = args.log2_rows

    settings = RenderSettings(density_scale=1.0, mean_density=0.5)
    net = build_nerf_network(cfg, bound=settings.bound)
    params = net.init_params(jax.random.PRNGKey(args.seed))

    res = args.res
    cam = Camera(fl_x=res * 1.3875, fl_y=res * 1.3875,
                 cx=res / 2, cy=res / 2)
    aabb = jnp.asarray(settings.aabb, jnp.float32)

    def traced_gt(camera, rot, origin, w, h, ss):
        """Pixel-integrated analytic GT: mean of ss^2 sub-pixel traces."""
        if ss <= 1:
            ro, rd = generate_rays(camera, rot, origin, w, h)
            return trace_scene(np.asarray(ro), np.asarray(rd))
        acc = np.zeros((w * h, 3), np.float32)
        for i in range(ss):
            for j in range(ss):
                sub = Camera(fl_x=camera.fl_x, fl_y=camera.fl_y,
                             cx=camera.cx - ((i + 0.5) / ss - 0.5),
                             cy=camera.cy - ((j + 0.5) / ss - 0.5))
                ro, rd = generate_rays(sub, rot, origin, w, h)
                acc += trace_scene(np.asarray(ro), np.asarray(rd))
        return acc / (ss * ss)

    # --- precompute per-view ngp-space rays + analytic gt ---------------
    views = []
    for v in range(args.views):
        pose = orbit_pose(2 * math.pi * v / args.views,
                          elev=0.15 + 0.25 * ((v * 7) % 5) / 4)
        ngp = nerf_matrix_to_ngp(pose, settings.scale)
        rot, orig_t = jnp.asarray(ngp[:3, :3]), jnp.asarray(ngp[:3, 3])
        ro, rd = generate_rays(cam, rot, orig_t, res, res)
        ro, rd = np.asarray(ro), np.asarray(rd)
        views.append((ro, rd, traced_gt(cam, rot, orig_t, res, res,
                                        args.gt_ss)))
    print(f"[scene] {args.views} views x {res}x{res} analytic gt ready "
          f"(gt_ss={args.gt_ss})", file=sys.stderr, flush=True)

    trainer = Trainer(net, settings,
                      loss_config={"otype": "Huber"},
                      optimizer_config={"otype": "Adam",
                                        "learning_rate": args.lr,
                                        "beta1": 0.9, "beta2": 0.99,
                                        "epsilon": 1e-15},
                      n_samples=args.n_samples,
                      brick_reg=args.brick_reg)
    opt_state, ema = trainer.init_state(params)
    grid = jnp.full((settings.cascade * settings.grid_h ** 3,), 1.0,
                    jnp.float32)

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    dg_settings = settings
    for step in range(args.steps):
        vi = int(rng.integers(len(views)))
        ro, rd, gt = views[vi]
        idx = rng.integers(0, ro.shape[0], args.batch)
        bo = jnp.asarray(ro[idx])
        bd = jnp.asarray(rd[idx])
        nears, fars = near_far_from_aabb(bo, bd, aabb, settings.min_near)
        target = jnp.asarray(gt[idx])
        key = jax.random.PRNGKey(args.seed * 1000003 + step)
        params, opt_state, ema, loss = trainer.step(
            params, opt_state, ema, (bo, bd, nears, fars, target), key,
            density_grid=grid)
        if args.project_every and step % args.project_every == 0:
            params = trainer.project(params)
        if step >= 256 and step % args.grid_update_every == 0:
            grid = generate_density_grid(net, params, grid, dg_settings,
                                         key=key)
        if step % args.log_every == 0 or step == args.steps - 1:
            md = float(np.asarray(mean_density(grid)))
            print(f"[train] step {step} loss {float(loss):.5f} "
                  f"mean_density {md:.4f} ({time.time()-t0:.0f}s)",
                  file=sys.stderr, flush=True)

    # --- held-out eval (train-style renderer, analytic gt) --------------
    from nerf_tpu.train.trainer import render_train

    er = args.eval_res
    ess = args.eval_ss or args.gt_ss
    rr = er * ess  # render at the supersampled grid, box-filter down
    ecam = Camera(fl_x=rr * 1.3875, fl_y=rr * 1.3875, cx=rr / 2, cy=rr / 2)
    scores = []
    md = float(np.asarray(mean_density(grid)))
    eval_settings = settings
    for v in range(3):
        pose = orbit_pose(2 * math.pi * (v + 0.5) / 3, elev=0.3)
        ngp = nerf_matrix_to_ngp(pose, settings.scale)
        rot, orig_t = jnp.asarray(ngp[:3, :3]), jnp.asarray(ngp[:3, 3])
        ro, rd = generate_rays(ecam, rot, orig_t, rr, rr)
        gt = trace_scene(np.asarray(ro), np.asarray(rd))
        nears, fars = near_far_from_aabb(ro, rd, aabb, settings.min_near)
        # chunked: rr^2 rays x n_samples all-lanes would peak several GB
        # of per-level gather intermediates (measured ResourceExhausted
        # at 256^2 x 128 with F=4 rows)
        ck = 16384
        parts = []
        for s0 in range(0, ro.shape[0], ck):
            r, _, _ = render_train(net, params, ro[s0:s0 + ck],
                                   rd[s0:s0 + ck], nears[s0:s0 + ck],
                                   fars[s0:s0 + ck], eval_settings,
                                   n_samples=args.n_samples,
                                   density_grid=grid)
            parts.append(np.asarray(r))
        rgb = np.concatenate(parts, axis=0)
        if ess > 1:
            rgb = rgb.reshape(er, ess, er, ess, 3).mean(axis=(1, 3))
            gt = gt.reshape(er, ess, er, ess, 3).mean(axis=(1, 3))
        scores.append(float(psnr(rgb, gt)))
    print(f"[eval] held-out PSNR {np.mean(scores):.2f} dB "
          f"(views: {['%.2f' % s for s in scores]})",
          file=sys.stderr, flush=True)

    record = dict(encoding=args.encoding, steps=args.steps,
                  batch=args.batch, res=res, views=args.views,
                  gt_ss=args.gt_ss, eval_ss=ess, eval_res=er,
                  brick_reg=args.brick_reg,
                  project_every=args.project_every,
                  log2_rows=cfg["encoding"].get("log2_rows"),
                  psnr_mean=float(np.mean(scores)), psnr_views=scores,
                  mean_density=md, wall_s=time.time() - t0)
    if args.record:
        with open(args.record, "w") as f:
            json.dump(record, f, indent=1)
    if args.out:
        import dataclasses

        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        flat = np.asarray(net.pack_params(params))
        save_snapshot(args.out, cfg, flat, np.asarray(grid),
                      dataclasses.replace(settings, mean_density=md))
        print(f"[save] {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB)",
              file=sys.stderr, flush=True)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
