"""Full-frame precision/quality records on a trained scene.

VERDICT r2 item 7: round 2's 98 dB bf16-vs-f32 record was on a random
synthetic snapshot; structured trained weights stress bf16 differently.
This script loads a TRAINED snapshot (scripts/train_sharp_scene.py) and
records full-frame PSNRs between render paths:
  - flagship (fused Pallas head, bf16 packed tables) vs f32 oracle chain
  - for tcnn-HashGrid snapshots: the convert_to_tpugrid fast path vs the
    tcnn-exact render (VERDICT r2 item 5 evidence)

Usage:
  python scripts/record_quality.py --snapshot assets/sharp_tpugrid.msgpack \
      --res 256 --record quality_frame.json [--convert] [--log2-rows 16]
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


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--snapshot", required=True)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--record", default=None)
    p.add_argument("--convert", action="store_true",
                   help="also record the tcnn->TpuGrid conversion PSNR")
    p.add_argument("--hybrid", action="store_true",
                   help="also record the hybrid exact-serving path vs "
                        "the pure tcnn render (should be ULP-level)")
    p.add_argument("--log2-rows", type=int, default=None)
    p.add_argument("--density-scale", type=float, default=1.0)
    args = p.parse_args(argv)

    from nerf_tpu.utils.compile_cache import enable as enable_cache

    enable_cache(os.path.join(REPO, ".xla_cache"))

    from nerf_tpu.core.types import Camera
    from nerf_tpu.render.engine import NerfRender
    from nerf_tpu.utils.metrics import psnr

    res = args.res
    cam = Camera(fl_x=res * 1.3875, fl_y=res * 1.3875,
                 cx=res / 2, cy=res / 2)
    # held-out orbit view (matches train_sharp_scene eval poses)
    ang, elev, radius = 2 * math.pi * 0.5 / 3, 0.3, 6.0
    c, s = math.cos(ang), math.sin(ang)
    ce, se = math.cos(elev), math.sin(elev)
    rot = (np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
           @ np.array([[1, 0, 0], [0, ce, -se], [0, se, ce]], np.float32))
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = rot
    pose[:3, 3] = rot @ np.array([0.0, 0.0, radius], np.float32)

    import bench as _bench  # repo-root module: shared settings so every
    # consumer reuses the same compiled merged-round programs

    def render(use_fused, packed, convert=False, hybrid=False):
        eng = NerfRender(
            settings=_bench.make_settings(
                65536, density_scale=args.density_scale),
            use_fused=use_fused, packed_grid=packed)
        eng.reload_network_from_file(args.snapshot)
        eng.set_resolution((res, res))
        stats = None
        if convert:
            stats = eng.convert_to_tpugrid(log2_rows=args.log2_rows)
        elif hybrid:
            stats = eng.convert_to_hybrid(log2_rows=args.log2_rows)
        rgb, depth, wsum = eng.render_frame_arrays(cam, pose)
        return np.asarray(rgb), stats

    record = {"snapshot": args.snapshot, "res": res}

    oracle, _ = render(use_fused=False, packed=False)
    flagship, _ = render(use_fused=True, packed=True)
    record["psnr_flagship_vs_oracle"] = float(psnr(flagship, oracle))
    print(f"[quality] flagship(bf16 fused+packed) vs f32 oracle: "
          f"{record['psnr_flagship_vs_oracle']:.2f} dB",
          file=sys.stderr, flush=True)

    # analytic ground truth for the same view (the scene the snapshot was
    # trained on) — full-frame scene quality through the REAL marcher
    import jax.numpy as jnp

    from nerf_tpu.render.rays import generate_rays, nerf_matrix_to_ngp
    from scripts.train_sharp_scene import trace_scene

    ngp = nerf_matrix_to_ngp(pose, 0.33)
    ro, rd = generate_rays(cam, jnp.asarray(ngp[:3, :3]),
                           jnp.asarray(ngp[:3, 3]), res, res)
    gt = trace_scene(np.asarray(ro), np.asarray(rd))
    record["psnr_flagship_vs_gt"] = float(psnr(flagship, gt))
    record["psnr_oracle_vs_gt"] = float(psnr(oracle, gt))
    print(f"[quality] flagship vs analytic GT: "
          f"{record['psnr_flagship_vs_gt']:.2f} dB (oracle "
          f"{record['psnr_oracle_vs_gt']:.2f} dB)",
          file=sys.stderr, flush=True)

    if args.convert:
        converted, stats = render(use_fused=True, packed=True, convert=True)
        record["psnr_converted_vs_oracle"] = float(psnr(converted, oracle))
        record["convert_stats"] = stats
        print(f"[quality] converted TpuGrid vs oracle: "
              f"{record['psnr_converted_vs_oracle']:.2f} dB",
              file=sys.stderr, flush=True)

    if args.hybrid:
        hyb, hstats = render(use_fused=True, packed=True, hybrid=True)
        record["psnr_hybrid_vs_oracle"] = float(psnr(hyb, oracle))
        record["hybrid_stats"] = dict(
            log2_rows=hstats["log2_rows"],
            exact_levels=hstats["exact_levels"])
        n_ex = sum(hstats["exact_levels"])
        print(f"[quality] hybrid ({n_ex}/{len(hstats['exact_levels'])} "
              f"levels row-served) vs oracle: "
              f"{record['psnr_hybrid_vs_oracle']:.2f} dB",
              file=sys.stderr, flush=True)

    if args.record:
        with open(args.record, "w") as f:
            json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
