"""Isolated merged-round timing on the TPU (decomposes the per-round cost).

Times the _round_merged program variants on REAL round-0 ray state from
the committed sharp scene: bucket=0 (march+composite only), each eval
bucket, and all-lanes. The difference between bucket=0 and bucket=k
isolates the network-eval share; comparing bucket sizes isolates the
eval's size scaling from its fixed cost. Forced-read protocol (counts
output), warm timings over --reps reps.
"""
import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot",
                    default=os.path.join(REPO, "assets",
                                         "sharp_tpugrid.msgpack"))
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--round", type=int, default=0, dest="round_idx",
                    help="advance this many real rounds before timing")
    ap.add_argument("--skip-row-w", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--probes", type=int, default=32)
    args = ap.parse_args()

    import dataclasses

    import jax.numpy as jnp

    from bench import make_settings
    from nerf_tpu.core.types import Camera
    from nerf_tpu.render.engine import NerfRender
    from nerf_tpu.render.march import _round_merged
    from nerf_tpu.render.rays import generate_rays, near_far_from_aabb, \
        nerf_matrix_to_ngp
    from nerf_tpu.utils.compile_cache import enable as enable_cache

    enable_cache(os.path.join(REPO, ".xla_cache"))

    s = dataclasses.replace(make_settings(65536, density_scale=1.0),
                            skip_row_w=args.skip_row_w,
                            ray_chunk=args.chunk,
                            probes_per_round=args.probes)
    eng = NerfRender(settings=s)
    eng.reload_network_from_file(args.snapshot)
    eng.set_resolution((args.res, args.res))
    if eng._render_fn is None:
        eng._render_fn = eng._build_render_fn()
        eng._params_infer = None
    if eng._params_infer is None:
        eng._params_infer = eng.network.prepare_params(eng.params)
    params = eng._params_infer
    net = eng.network

    if eng._resolve_fused():
        def apply_fn(p, pos01_cf, dir01_cf):
            return net.apply_cf_fused(p, pos01_cf, dir01_cf)
    else:
        def apply_fn(p, pos01_cf, dir01_cf):
            return net.apply_cf(p, pos01_cf, dir01_cf)

    w = h = args.res
    cam = Camera(fl_x=w * 1.3875, fl_y=w * 1.3875, cx=w / 2, cy=h / 2)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 6],
                     [0, 0, 0, 1]], np.float32)
    new_pose = nerf_matrix_to_ngp(pose, s.scale)
    rays_o, rays_d = generate_rays(cam, np.asarray(new_pose[:3, :3]),
                                   np.asarray(new_pose[:3, 3]), w, h)
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray(s.aabb, jnp.float32),
                                     s.min_near)
    m = s.ray_chunk
    o_cf = rays_o[:m].T
    d_cf = rays_d[:m].T
    frw = fars[:m]
    t = nears[:m]
    alive = np.asarray(nears[:m]) < np.asarray(frw)
    alive = jnp.asarray(alive)
    n_emit = jnp.zeros((m,), jnp.int32)
    shadow = jnp.zeros((m,), jnp.float32)
    orig = jnp.arange(m, dtype=jnp.int32)
    w_sum = jnp.zeros((m,), jnp.float32)
    depth = jnp.zeros((m,), jnp.float32)
    rgb = jnp.zeros((3, m), jnp.float32)
    sf = eng._get_skip_field()
    grid = eng.density_grid

    def run(bucket, state, ridx):
        return _round_merged(apply_fn, params, grid, sf, o_cf, d_cf, frw,
                             state[0], state[1], state[2], state[3], orig,
                             state[4], state[5], state[6],
                             jnp.int32(ridx), jnp.int32(0), s, bucket)

    # advance to the requested round with all-lanes evals (exact)
    state = (t, alive, n_emit, shadow, w_sum, depth, rgb)
    for r in range(args.round_idx):
        out = run(None, state, r)
        state = (out[0], out[6], out[1], out[2], out[3], out[4], out[5])
    ridx = args.round_idx
    k_true = None

    variants = [0] + sorted(s.bucket_set) + [None]
    for bucket in variants:
        # warm compile
        out = run(bucket, state, ridx)
        counts = np.asarray(out[7])
        if k_true is None:
            pass
        k_true = int(counts[0])
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = run(bucket, state, ridx)
            np.asarray(out[7])  # forced read
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(f"[profile] bucket={bucket}: {med * 1e3:.1f} ms "
              f"(n_valid={counts[0]}, n_alive={counts[1]}, "
              f"frozen={counts[2]}, spill={counts[3]})", flush=True)


if __name__ == "__main__":
    main()
