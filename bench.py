"""Benchmark: full-frame render throughput on real hardware.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): >= 200M rays/s aggregate on v5e-8 => 25M rays/s
per chip; vs_baseline = measured rays/s per chip / 25e6.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from nerf_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    from nerf_tpu.core.snapshot import make_synthetic_snapshot
    from nerf_tpu.core.types import Camera, RenderSettings
    from nerf_tpu.render.engine import NerfRender

    w = h = 800
    snap = make_synthetic_snapshot(seed=3, grid_h=128)
    eng = NerfRender(settings=RenderSettings(density_scale=25.0))
    eng.load_from_snapshot(snap)
    eng.set_resolution((w, h))

    cam = Camera(fl_x=1110.0, fl_y=1110.0, cx=w / 2, cy=h / 2)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 6],
                     [0, 0, 0, 1]], np.float32)

    # warmup/compile
    out = eng.render_frame_arrays(cam, pose)
    jax.block_until_ready(out)

    n_frames = 5
    t0 = time.perf_counter()
    for _ in range(n_frames):
        out = eng.render_frame_arrays(cam, pose)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_frames

    rays_per_sec = w * h / dt
    print(json.dumps({
        "metric": "render_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / 25e6, 4),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # still emit a parseable record on failure
        import sys

        print(f"bench failed: {type(e).__name__}: {e}", file=sys.stderr)
        print(json.dumps({
            "metric": "render_rays_per_sec_per_chip",
            "value": 0.0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
        }))
        raise SystemExit(1)
