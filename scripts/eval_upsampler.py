"""Learned-upsampler quality record on non-toy imagery.

VERDICT r2 weak #7: the round-2 upsampler evidence was tiny synthetic
pairs. This evaluates the DLSS-replacement on renders of the analytic
hard-surface scene (scripts/train_sharp_scene.py's ground truth): train
on (128^2 -> 256^2) pairs from K orbit views, report held-out PSNR of
learned vs bilinear at 2x — the quality-at-2x contract DLSS supplied in
the reference (src/dlss.cu:896-1026).

Usage: python scripts/eval_upsampler.py [--views 12] [--steps 400]
       [--record quality_upsampler.json]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.train_sharp_scene import orbit_pose, trace_scene  # noqa: E402


def _frame(res: int, angle: float, elev: float) -> np.ndarray:
    """Analytic render [res, res, 3] via pinhole rays (ngp coords)."""
    from nerf_tpu.core.types import Camera
    from nerf_tpu.render.rays import generate_rays, nerf_matrix_to_ngp

    import jax.numpy as jnp

    cam = Camera(fl_x=res * 1.3875, fl_y=res * 1.3875,
                 cx=res / 2, cy=res / 2)
    ngp = nerf_matrix_to_ngp(orbit_pose(angle, elev), 0.33)
    ro, rd = generate_rays(cam, jnp.asarray(ngp[:3, :3]),
                           jnp.asarray(ngp[:3, 3]), res, res)
    rgb = trace_scene(np.asarray(ro), np.asarray(rd))
    return rgb.reshape(res, res, 3).astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--views", type=int, default=24)
    p.add_argument("--holdout", type=int, default=4)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--record", default=None)
    p.add_argument("--platform", default="cpu",
                   help="cpu (default) or tpu — the 800^2 serving-scale "
                        "record (VERDICT r4 weak #7) needs the chip")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", args.platform)
    from nerf_tpu.utils.compile_cache import enable as enable_cache

    enable_cache(os.path.join(REPO, ".xla_cache"))

    from nerf_tpu.buffer.upsampler import (
        BilinearUpsampler,
        LearnedUpsampler,
        train_upsampler,
    )
    from nerf_tpu.utils.metrics import psnr

    hi_res, lo_res = args.res, args.res // 2
    pairs, tests = [], []
    total = args.views + args.holdout
    for v in range(total):
        ang = 2 * math.pi * v / total
        elev = 0.1 + 0.3 * ((v * 3) % 5) / 4
        hi = _frame(hi_res, ang, elev)
        lo = _frame(lo_res, ang, elev)
        (pairs if v < args.views else tests).append(
            (jnp.asarray(lo), jnp.asarray(hi)))
    print(f"[upsampler] {len(pairs)} train / {len(tests)} held-out pairs",
          file=sys.stderr, flush=True)

    params, _losses = train_upsampler(pairs, steps=args.steps)
    learned = LearnedUpsampler((hi_res, hi_res), params=params)
    bilinear = BilinearUpsampler((hi_res, hi_res))

    def _score(pairs_list):
        ps_l, ps_b = [], []
        for lo, hi in pairs_list:
            gt = np.asarray(hi)
            ps_l.append(float(psnr(
                np.asarray(learned.run(lo))[..., :3], gt)))
            ps_b.append(float(psnr(
                np.asarray(bilinear.run(lo))[..., :3], gt)))
        return ps_l, ps_b

    ps_l, ps_b = _score(tests)
    tr_l, tr_b = _score(pairs[:4])  # train-set diagnostic
    rec = dict(res_lo=lo_res, res_hi=hi_res, views=args.views,
               holdout=args.holdout, steps=args.steps,
               psnr_learned=float(np.mean(ps_l)),
               psnr_bilinear=float(np.mean(ps_b)),
               psnr_train_learned=float(np.mean(tr_l)),
               psnr_train_bilinear=float(np.mean(tr_b)),
               per_view_learned=ps_l, per_view_bilinear=ps_b)
    print(f"[upsampler] held-out 2x PSNR: learned "
          f"{rec['psnr_learned']:.2f} dB vs bilinear "
          f"{rec['psnr_bilinear']:.2f} dB", file=sys.stderr, flush=True)
    if args.record:
        with open(args.record, "w") as f:
            json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
