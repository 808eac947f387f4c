"""Step-exact NumPy simulator of the reference march/composite.

Re-derives, per ray and in plain float32 NumPy, the semantics of
kernel_march_rays (render_utils.h:524-655), kernel_composite_rays
(render_utils.h:658-751) and get_image_and_depth (render_utils.h:241-265),
with unbounded while-loops — the dynamic control flow the TPU build
replaces with masked static-shape rounds. Used as the correctness oracle:
compositing is invariant to round partitioning, so the TPU renderer must
reproduce this simulator's output bit-closely.
"""
from __future__ import annotations

import numpy as np

from nerf_tpu.core.types import DENSITY_THRESH, MIN_STEPSIZE, RenderSettings

f32 = np.float32


def mip_from_pos(x, y, z, cascade):
    mx = max(abs(x), abs(y), abs(z))
    _, exp = np.frexp(mx)
    return int(min(cascade - 1, max(0, exp)))


def march_ray(o, d, near, far, grid, s: RenderSettings, max_samples=4096):
    """Collect every sample the reference marcher would emit for one ray."""
    h = s.grid_h
    bound = f32(s.bound)
    dt_gamma = f32(s.dt_gamma)
    dt_min = f32(MIN_STEPSIZE)
    dt_max = f32(2.0 * s.bound / s.grid_h)
    thresh = f32(min(DENSITY_THRESH, s.mean_density))

    t = f32(near)
    last_t = t
    o64 = o.astype(np.float64)
    d64 = d.astype(np.float64)
    xyzs, dts, rds = [], [], []
    while t < far and len(xyzs) < max_samples:
        # single-rounding o + t*d (FMA) — XLA contracts the mul+add on both
        # CPU and TPU; two-rounding NumPy arithmetic diverges by 1 ulp and
        # flips knife-edge voxel decisions
        x = np.clip((o64 + np.float64(t) * d64).astype(f32), -bound, bound)
        level = mip_from_pos(x[0], x[1], x[2], s.cascade)
        mip_bound = f32(min(2.0 ** level, s.bound))
        n = np.clip(f32(0.5) * (x / mip_bound + f32(1.0)) * h, 0.0,
                    h - 1).astype(np.int32)
        idx = level * h**3 + n[0] * h * h + n[1] * h + n[2]
        dt = f32(np.clip(t * dt_gamma, dt_min, dt_max))
        if grid[idx] > thresh:
            t_new = f32(t + dt)
            xyzs.append(x.copy())
            dts.append(dt)
            rds.append(f32(t_new - last_t))
            last_t = t_new
            t = t_new
        else:
            sgn = np.copysign(f32(1.0), d).astype(f32)
            bnd = ((n.astype(f32) + f32(0.5) + f32(0.5) * sgn)
                   / f32(h - 1) * f32(2.0) - f32(1.0)) * mip_bound
            # reciprocal-multiply like the reference (render_utils.h:576)
            t_axes = ((bnd - x) * (f32(1.0) / d)).astype(f32)
            tt = f32(t + max(0.0, t_axes.min()))
            while True:
                step = f32(np.clip(t * dt_gamma, dt_min, dt_max))
                t = f32(t + step)
                if t >= tt:
                    break
    return (np.asarray(xyzs, f32).reshape(-1, 3), np.asarray(dts, f32),
            np.asarray(rds, f32))


def composite_ray(sigmas, rgbs, dts, rds, t_start):
    """render_utils.h:698-743 for one ray's full sample list."""
    w_sum = f32(0.0)
    d_acc = f32(0.0)
    rgb_acc = np.zeros(3, f32)
    t = f32(t_start)
    for k in range(len(dts)):
        alpha = f32(1.0 - np.exp(-sigmas[k] * dts[k]))
        big_t = f32(1.0 - w_sum)
        w = f32(alpha * big_t)
        w_sum = f32(w_sum + w)
        t = f32(t + rds[k])
        d_acc = f32(d_acc + w * t)
        rgb_acc = (rgb_acc + w * rgbs[k]).astype(f32)
        if big_t < 1e-4:
            break
    return rgb_acc, d_acc, w_sum


def render_rays_reference(apply_fn, params, grid, rays_o, rays_d, nears,
                          fars, s: RenderSettings):
    """Full per-ray simulation. apply_fn as in nerf_tpu.render.march."""
    n = rays_o.shape[0]
    out_rgb = np.zeros((n, 3), f32)
    out_depth = np.zeros(n, f32)
    out_wsum = np.zeros(n, f32)
    for i in range(n):
        if nears[i] >= fars[i]:
            pass  # miss: background only
        else:
            xyz, dts, rds = march_ray(rays_o[i], rays_d[i], nears[i],
                                      fars[i], grid, s)
            if len(dts):
                pos01 = xyz / f32(2.0 * s.bound) + f32(0.5)
                dir01 = np.broadcast_to(rays_d[i] * f32(0.5) + f32(0.5),
                                        xyz.shape)
                rgb, sigma = apply_fn(params, pos01, dir01)
                rgb = np.asarray(rgb, f32)
                sigma = np.asarray(sigma, f32) * f32(s.density_scale)
                out_rgb[i], out_depth[i], out_wsum[i] = composite_ray(
                    sigma, rgb, dts, rds, nears[i])
        # get_image_and_depth (render_utils.h:241-265)
        out_rgb[i] += (f32(1.0) - out_wsum[i]) * f32(s.bg_color)
        span = fars[i] - nears[i]
        out_depth[i] = (max(out_depth[i] - nears[i], 0.0) / span
                        if span > 0 else 0.0)
    return out_rgb, out_depth, out_wsum
