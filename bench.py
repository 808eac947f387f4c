"""Benchmark: full-frame render throughput on real hardware.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): >= 200M rays/s aggregate on v5e-8 => 25M rays/s
per chip; vs_baseline = measured rays/s per chip / 25e6.

Methodology notes (this environment measures treacherously — see
BASELINE.md):
  - jax.block_until_ready is ASYNC through the relay, so every frame's
    timing is forced by a host read of a reduced scalar; the median of 5
    is reported;
  - the rendered frame is VALIDATED (center rays hit the occupied sphere,
    corner rays miss) before a measurement is accepted;
  - attempt 0 uses the host-looped renderer (adaptive num_step + bucketed
    sample compaction); the on-device while_loop renderer is the
    fallback attempt.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

SLOW_THRESHOLD_RAYS_PER_SEC = 5e4
MAX_ATTEMPTS = 2


def _validate(eng, cam, pose, w, h) -> bool:
    rgb, depth, wsum = eng.render_frame_arrays(cam, pose)
    wsum = np.asarray(wsum).reshape(h, w)
    rgb = np.asarray(rgb)
    ok = (np.isfinite(rgb).all()
          and wsum[h // 2, w // 2] > 1e-3
          and abs(wsum[0, 0]) < 1e-6)
    if not ok:
        print(f"[bench] VALIDATION FAILED: center wsum "
              f"{wsum[h // 2, w // 2]:.4f}, corner {wsum[0, 0]:.4f}",
              file=sys.stderr)
    return ok


def _measure(eng, cam, pose, w, h, n_frames=5):
    import jax.numpy as jnp

    times = []
    for _ in range(n_frames):
        t0 = time.perf_counter()
        out = eng.render_frame_arrays(cam, pose)
        # block_until_ready is ASYNC through this environment's relay
        # (returns in us while the device runs seconds) — only a forced
        # host read guarantees completion. Costs one ~26ms RTT per frame.
        float(np.asarray(jnp.sum(out[2])))
        times.append(time.perf_counter() - t0)
    return w * h / float(np.median(times))


def main():
    from nerf_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()  # safe (earlier suspicion was an async-timing artifact)

    from nerf_tpu.core.snapshot import make_synthetic_snapshot
    from nerf_tpu.core.types import Camera, RenderSettings
    from nerf_tpu.render.engine import NerfRender

    w = h = 800
    snap = make_synthetic_snapshot(seed=3, grid_h=128)
    cam = Camera(fl_x=1110.0, fl_y=1110.0, cx=w / 2, cy=h / 2)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 6],
                     [0, 0, 0, 1]], np.float32)

    best = 0.0
    for attempt in range(MAX_ATTEMPTS):
        # host-looped renderer first: adaptive num_step + bucketed sample
        # compaction (reference schedule, nerf_render.cu:300) — the device
        # while_loop path is the fallback
        settings = RenderSettings(density_scale=25.0,
                                  probes_per_round=32,
                                  ray_chunk=131072,
                                  host_loop=(attempt == 0))
        eng = NerfRender(settings=settings)
        eng.load_from_snapshot(snap)
        eng.set_resolution((w, h))
        t0 = time.perf_counter()
        if not _validate(eng, cam, pose, w, h):
            continue
        rays_per_sec = _measure(eng, cam, pose, w, h)
        print(f"[bench] attempt {attempt}: {rays_per_sec / 1e6:.3f} Mray/s "
              f"(wall {time.perf_counter() - t0:.0f}s)", file=sys.stderr)
        best = max(best, rays_per_sec)
        if best >= SLOW_THRESHOLD_RAYS_PER_SEC:
            break
        import jax

        jax.clear_caches()

    print(json.dumps({
        "metric": "render_rays_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "rays/s",
        "vs_baseline": round(best / 25e6, 4),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # still emit a parseable record on failure
        print(f"bench failed: {type(e).__name__}: {e}", file=sys.stderr)
        print(json.dumps({
            "metric": "render_rays_per_sec_per_chip",
            "value": 0.0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
        }))
        raise SystemExit(1)
