"""Multi-chip ray parallelism.

Reference parity: the reference's only multi-device strategy is static
data parallelism over pixels — compile-time NGPU=2, strided pixel
assignment, one std::thread + stream + full network replica per GPU, and
host-side result interleaving (common.h:91; render_utils.h:37;
nerf_render.cu:48-56, 252-362).

TPU rebuild: a 1-D `jax.sharding.Mesh` over any number of chips;
`shard_map` gives each chip a CONTIGUOUS pixel block (better locality than
the reference's striding; same pixel set), params + density grid are
replicated via sharding specs (no host-mediated broadcast —
cf. nerf_render.cu:422-428,458-462), and the output is a global sharded
array, so gathering is an XLA all-gather over ICI instead of the
reference's per-GPU DtoH memcpy + host interleave loop
(nerf_render.cu:345-359). No collectives are needed inside the hot loop;
the per-iteration host sync of the reference (nerf_render.cu:288-292) has
no analog here.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerf_tpu.core.types import Camera, RenderSettings
from nerf_tpu.render.march import render_rays
from nerf_tpu.render.rays import generate_rays, near_far_from_aabb

RAY_AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None, axis: str = RAY_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated over the mesh (ref: per-GPU weight
    replication, nerf_render.cu:101-104,173-183)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_render(render_core, mesh: Mesh, w: int, h: int,
                 settings: RenderSettings, net, use_fused: bool = False):
    """Build a jitted, ray-sharded whole-frame render function.

    Each chip renders pixels [idx*block, (idx+1)*block); outputs come back
    as one global array sharded over the ray axis.
    """
    n_dev = mesh.devices.size
    n_pixels = w * h
    if n_pixels % n_dev != 0:
        raise ValueError(
            f"resolution {w}x{h} must divide the {n_dev}-device mesh")
    block = n_pixels // n_dev

    if use_fused:
        def apply_fn(params, pos01_cf, dir01_cf):
            return net.apply_cf_fused(params, pos01_cf, dir01_cf)
    else:
        def apply_fn(params, pos01_cf, dir01_cf):
            return net.apply_cf(params, pos01_cf, dir01_cf)

    def shard_fn(params, density_grid, cam_params, rotation, origin,
                 perturb_seed):
        idx = jax.lax.axis_index(RAY_AXIS)
        cam = Camera(fl_x=cam_params[0], fl_y=cam_params[1],
                     cx=cam_params[2], cy=cam_params[3])
        rays_o, rays_d = generate_rays(cam, rotation, origin, w, h,
                                       pixel_offset=idx * block,
                                       n_pixels=block)
        nears, fars = near_far_from_aabb(
            rays_o, rays_d, jnp.asarray(settings.aabb, jnp.float32),
            settings.min_near)
        res = render_rays(apply_fn, params, density_grid, rays_o, rays_d,
                          nears, fars, settings,
                          perturb_seed=perturb_seed
                          + idx * jnp.int32(1315423911))
        return res.rgb, res.depth, res.weight_sum

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        check_vma=False,
    )
    return jax.jit(mapped)
