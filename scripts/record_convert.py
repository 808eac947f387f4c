"""Foreign-snapshot -> TpuGrid conversion quality record (full frame).

VERDICT r2 item 5 evidence: the reference's core capability is rendering
a foreign instant-ngp snapshot fast (nerf_render.cu:431-473). The repo's
fast path is TpuGrid; encodings/convert.py resamples a tcnn-layout hash
table into brick rows. This records the full-frame PSNR of the converted
TpuGrid render against the tcnn-exact HashGrid render of the SAME
snapshot — the end-to-end conversion cost through the real marcher.

Runs on CPU (forced) by default so it does not contend with TPU jobs:
  python scripts/record_convert.py --res 128 --record quality_convert.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--log2-rows", type=int, default=None)
    p.add_argument("--record", default=None)
    p.add_argument("--tpu", action="store_true",
                   help="run on the default backend instead of forcing CPU")
    args = p.parse_args(argv)

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from nerf_tpu.utils.compile_cache import enable as enable_cache

    enable_cache(os.path.join(REPO, ".xla_cache"))

    import bench as _bench
    from nerf_tpu.core.snapshot import (
        DEFAULT_NETWORK_CONFIG,
        make_synthetic_snapshot,
    )
    from nerf_tpu.core.types import Camera
    from nerf_tpu.render.engine import NerfRender
    from nerf_tpu.utils.metrics import psnr

    res = args.res
    cam = Camera(fl_x=res * 1.3875, fl_y=res * 1.3875,
                 cx=res / 2, cy=res / 2)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 6],
                     [0, 0, 0, 1]], np.float32)

    # the foreign-layout fixture: a tcnn-layout HashGrid snapshot
    snap = make_synthetic_snapshot(seed=3, grid_h=128,
                                   network_config=DEFAULT_NETWORK_CONFIG)

    def render(convert):
        eng = NerfRender(settings=_bench.make_settings(
            min(65536, res * res), density_scale=25.0))
        eng.load_from_snapshot(snap)
        eng.set_resolution((res, res))
        stats = None
        if convert:
            stats = eng.convert_to_tpugrid(log2_rows=args.log2_rows)
        rgb, depth, wsum = eng.render_frame_arrays(cam, pose)
        return np.asarray(rgb), stats

    exact, _ = render(convert=False)
    converted, stats = render(convert=True)
    record = {
        "res": res,
        "snapshot": "synthetic tcnn-layout (DEFAULT_NETWORK_CONFIG)",
        "psnr_converted_vs_exact": float(psnr(converted, exact)),
        "convert_stats": stats,
    }
    print(f"[convert] TpuGrid-converted vs tcnn-exact render: "
          f"{record['psnr_converted_vs_exact']:.2f} dB",
          file=sys.stderr, flush=True)
    if args.record:
        with open(args.record, "w") as f:
            json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
