"""Render-settings sweep on the trained sharp scene (TPU experiment loop).

Measures rays/s for a list of RenderSettings variants over the committed
benchmark snapshot, printing the same forced-read protocol + phase split
as bench.py. Used to pick the shipped bench configuration (march probe
count, cap_emit, skip_row_w, compaction ladder) from measurements rather
than guesses; the winner is then baked into bench.make_settings and its
program family warmed + committed via a final bench.py run.

Usage:
    python scripts/sweep_settings.py [--res 800] [--frames 3]
        [--snapshot assets/sharp_tpugrid.msgpack]
        [--variant name k=v,k=v ...]   # repeatable; default built-ins
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUILTIN = [
    # sweep 1 (2026-08-17): base 0.122, w4 0.127, w4-p16 0.101 (94 rounds),
    # w4-ladder 0.131 Mray/s @800x800 — the frame is ~62 chunk-rounds x
    # ~80ms; fixed per-round cost dominates, so sweep 2 trades round
    # count for fatter rounds (bigger ray chunks, more probes).
    # c256 (chunk 262144, 1M-lane eval buckets) OOM'd the v5e: the merged
    # program's replay outputs (pos01/dir01 at [3, P*m]) double-buffer
    # across the depth-2 pipeline — keep P*m <= ~4M lanes.
    ("p64", {"skip_row_w": 4, "probes_per_round": 64, "extend_steps": 64,
             "ray_bucket_set": (65536, 32768, 16384, 8192)}),
    ("c128", {"skip_row_w": 4, "ray_chunk": 131072,
              "ray_bucket_set": (131072, 32768, 8192),
              "bucket_set": (32768, 131072, 524288)}),
]


def parse_val(v: str):
    try:
        return json.loads(v)
    except json.JSONDecodeError:
        return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot",
                    default=os.path.join(REPO, "assets",
                                         "sharp_tpugrid.msgpack"))
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--variant", action="append", nargs=2,
                    metavar=("NAME", "OVERRIDES"), default=None,
                    help="e.g. --variant w4 'skip_row_w=4,cap_emit=0'")
    ap.add_argument("--dump-rounds", action="store_true",
                    help="print the last (warm) frame's per-round stats")
    args = ap.parse_args()

    from bench import make_settings
    from nerf_tpu.core.types import Camera
    from nerf_tpu.render.engine import NerfRender
    from nerf_tpu.utils.compile_cache import enable as enable_cache

    enable_cache(os.path.join(REPO, ".xla_cache"))

    variants = []
    if args.variant:
        for name, ov in args.variant:
            d = {}
            for kv in ov.split(","):
                if not kv:
                    continue
                k, _, v = kv.partition("=")
                d[k] = parse_val(v)
            variants.append((name, d))
    else:
        variants = BUILTIN

    w = h = args.res
    cam = Camera(fl_x=w * 1.3875, fl_y=w * 1.3875, cx=w / 2, cy=h / 2)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 6],
                     [0, 0, 0, 1]], np.float32)

    results = {}
    for name, ov in variants:
        s = dataclasses.replace(make_settings(65536, density_scale=1.0),
                                **{k: (tuple(v) if isinstance(v, list)
                                       else v) for k, v in ov.items()})
        try:
            eng = NerfRender(settings=s)
            eng.reload_network_from_file(args.snapshot)
            eng.set_resolution((w, h))
            eng.collect_stats = True
            times = []
            for i in range(args.frames):
                t0 = time.perf_counter()
                rgb, depth, wsum = eng.render_frame_arrays(cam, pose)
                tot = float(np.asarray(wsum.sum()))  # forced read = sync
                times.append(time.perf_counter() - t0)
                if i == 0 and not np.isfinite(tot):
                    print(f"[sweep] {name}: NON-FINITE frame", flush=True)
        except Exception as e:  # a variant must not kill the sweep (OOM)
            print(f"[sweep] {name}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        rays = w * h / float(np.median(times))
        st = (eng.last_stats or {}).get("rounds", [])
        merged = sum(r.get("merged_s", 0.0) for r in st)
        read = sum(r.get("read_s", 0.0) for r in st)
        lane = sum(r["m"] for r in st)
        alive = sum(r.get("n_alive_est", r["m"]) for r in st)
        results[name] = rays
        if args.dump_rounds:
            for r in st:
                print(f"[rounds] chunk={r['chunk']} m={r['m']} k={r['k']} "
                      f"alive={r.get('n_alive_est', '?')} "
                      f"frz={r.get('frozen', 0)} "
                      f"merged={r.get('merged_s', 0) * 1e3:.1f}ms "
                      f"read={r.get('read_s', 0) * 1e3:.1f}ms",
                      flush=True)
        print(f"[sweep] {name}: {rays / 1e6:.3f} Mray/s "
              f"(median {np.median(times):.2f}s over {args.frames}; "
              f"rounds {len(st)}, dispatch {merged:.2f}s, reads {read:.2f}s, "
              f"samples {sum(r['k'] for r in st)}, "
              f"occupancy {alive}/{lane} = {alive / max(lane, 1):.2f})",
              flush=True)
    best = max(results, key=results.get)
    print(f"[sweep] best: {best} {results[best] / 1e6:.3f} Mray/s",
          flush=True)


if __name__ == "__main__":
    main()
