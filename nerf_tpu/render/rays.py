"""Ray generation and AABB intersection.

Reference parity:
  - `nerf_matrix_to_ngp` axis permutation/negation + translation scaling
    (include/nerf-cuda/render_utils.h:68-77)
  - `set_rays_o` / `set_rays_d` pinhole ray generation
    (render_utils.h:31-66); the reference's NGPU pixel striding
    (render_utils.h:37) is replaced by block sharding in
    nerf_tpu/parallel (same pixels, TPU-friendly layout)
  - `kernel_near_far_from_aabb` slab test; misses get near=far=FLT_MAX,
    near clamped to min_near (render_utils.h:338-392)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nerf_tpu.core.types import Camera

_FLT_MAX = np.float32(np.finfo(np.float32).max)


def nerf_matrix_to_ngp(pose: np.ndarray, scale: float = 0.33,
                       offset=(0.0, 0.0, 0.0)) -> np.ndarray:
    """4x4 'nerf'-convention c2w -> ngp convention (render_utils.h:68-77)."""
    p = np.asarray(pose, np.float32)
    new_pose = np.array([
        [p[1, 0], -p[1, 1], -p[1, 2], p[1, 3] * scale + offset[0]],
        [p[2, 0], -p[2, 1], -p[2, 2], p[2, 3] * scale + offset[1]],
        [p[0, 0], -p[0, 1], -p[0, 2], p[0, 3] * scale + offset[2]],
        [0.0, 0.0, 0.0, 1.0],
    ], np.float32)
    return new_pose


def generate_rays(cam: Camera, rotation, origin, w: int, h: int,
                  pixel_offset: int = 0, n_pixels: int = -1):
    """Per-pixel rays (render_utils.h:31-66).

    rotation: [3,3] ngp-convention camera rotation; origin: [3].
    Pixels are row-major ids [pixel_offset, pixel_offset + n_pixels);
    a shard renders a contiguous block. Returns (rays_o [N,3], rays_d [N,3]).
    """
    if n_pixels < 0:
        n_pixels = w * h
    pid = pixel_offset + jnp.arange(n_pixels, dtype=jnp.int32)
    i = (pid % w).astype(jnp.float32) + 0.5
    j = (pid // w).astype(jnp.float32) + 0.5

    zs = jnp.ones_like(i)
    xs = (i - cam.cx) / cam.fl_x * zs
    ys = (j - cam.cy) / cam.fl_y * zs
    d = jnp.stack([xs, ys, zs], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = d @ jnp.asarray(rotation, jnp.float32).T
    rays_o = jnp.broadcast_to(jnp.asarray(origin, jnp.float32),
                              rays_d.shape)
    return rays_o, rays_d


def near_far_from_aabb(rays_o, rays_d, aabb, min_near: float = 0.2):
    """Slab test (render_utils.h:338-392). aabb: [6] (xmin..zmax)."""
    aabb = jnp.asarray(aabb, jnp.float32)
    o, d = rays_o, rays_d
    rd = 1.0 / d
    t0 = (aabb[:3] - o) * rd  # [N,3]
    t1 = (aabb[3:] - o) * rd
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)

    # Progressive max/min exactly as the per-axis code, including the
    # early-miss checks after y and z (render_utils.h:361-385).
    near = tn[..., 0]
    far = tf[..., 0]
    miss = (near > tf[..., 1]) | (tn[..., 1] > far)
    near = jnp.maximum(near, tn[..., 1])
    far = jnp.minimum(far, tf[..., 1])
    miss = miss | (near > tf[..., 2]) | (tn[..., 2] > far)
    near = jnp.maximum(near, tn[..., 2])
    far = jnp.minimum(far, tf[..., 2])

    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, _FLT_MAX, near)
    far = jnp.where(miss, _FLT_MAX, far)
    return near, far
