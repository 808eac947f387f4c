"""Training CLI — the capability the reference stubs out.

Trains an instant-ngp-style NeRF from a transforms.json dataset and saves
a reference-layout msgpack snapshot that both this framework and the CUDA
reference can load (param order per nerf_network.h:273-291).

Usage:
  python -m nerf_tpu.apps.train --data /path/to/lego --out lego.msgpack \
      [--steps 2000] [--batch 8192] [--config configs/nerf/base.json]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

from nerf_tpu.core.config import load_network_config
from nerf_tpu.core.snapshot import DEFAULT_NETWORK_CONFIG, save_snapshot
from nerf_tpu.core.types import RenderSettings
from nerf_tpu.models.nerf import build_nerf_network
from nerf_tpu.render.density_grid import generate_density_grid, mean_density
from nerf_tpu.render.rays import near_far_from_aabb
from nerf_tpu.train.dataset import load_transforms
from nerf_tpu.train.trainer import Trainer
from nerf_tpu.utils import logging as nlog


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True, help="dataset root dir")
    p.add_argument("--out", required=True, help="output .msgpack snapshot")
    p.add_argument("--config", default=None,
                   help="network config json (default: base config)")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--n-samples", type=int, default=128)
    p.add_argument("--bound", type=float, default=1.0)
    p.add_argument("--scale", type=float, default=0.33)
    p.add_argument("--grid-h", type=int, default=128)
    p.add_argument("--cascade", type=int, default=1)
    p.add_argument("--downsample", type=int, default=1)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--grid-update-every", type=int, default=16)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log-every", type=int, default=100)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    config = (load_network_config(args.config) if args.config
              else dict(DEFAULT_NETWORK_CONFIG))
    settings = RenderSettings(
        bound=args.bound, scale=args.scale, grid_h=args.grid_h,
        cascade=args.cascade,
        aabb=(-args.bound,) * 3 + (args.bound,) * 3,
    )

    nlog.info("loading dataset from %s", args.data)
    ds = load_transforms(args.data, scale=args.scale,
                         downsample=args.downsample,
                         max_images=args.max_images)
    nlog.info("dataset: %d images, %dx%d, %d rays", ds.n_images, ds.width,
              ds.height, ds.rays_o.shape[0])

    net = build_nerf_network(config, bound=settings.bound)
    key = jax.random.PRNGKey(args.seed)
    params = net.init_params(key)
    nlog.info("model: %d params", net.n_params)

    trainer = Trainer(net, settings,
                      loss_config=config.get("loss", {"otype": "Huber"}),
                      optimizer_config=config.get("optimizer"),
                      n_samples=args.n_samples)
    opt_state, ema = trainer.init_state(params)

    grid = jnp.full((settings.cascade * settings.grid_h ** 3,), 1.0 / 64,
                    jnp.float32)
    aabb = jnp.asarray(settings.aabb, jnp.float32)

    t0 = time.perf_counter()
    step = 0
    for rays_o, rays_d, target in ds.batches(args.batch, seed=args.seed):
        if step >= args.steps:
            break
        o = jnp.asarray(rays_o)
        d = jnp.asarray(rays_d)
        nears, fars = near_far_from_aabb(o, d, aabb, settings.min_near)
        params, opt_state, ema, loss = trainer.step(
            params, opt_state, ema, (o, d, nears, fars, jnp.asarray(target)),
            jax.random.fold_in(key, step), density_grid=None)
        step += 1
        if step % args.grid_update_every == 0:
            grid = generate_density_grid(
                net, ema if ema is not None else params, grid, settings,
                key=jax.random.fold_in(key, 10 ** 6 + step))
        if step % args.log_every == 0 or step == 1:
            dt = time.perf_counter() - t0
            nlog.info("step %d  loss %.5f  (%.1f rays/s)", step,
                      float(loss), step * args.batch / dt)

    final = ema if ema is not None else params
    md = float(mean_density(grid))
    save_settings = RenderSettings(
        bound=settings.bound, scale=settings.scale,
        cascade=settings.cascade, grid_h=settings.grid_h,
        mean_density=md, aabb=settings.aabb)
    flat = np.asarray(net.pack_params(final), np.float32)
    save_snapshot(args.out, config, flat, np.asarray(grid), save_settings)
    nlog.info("saved snapshot to %s (mean_density %.5f)", args.out, md)


if __name__ == "__main__":
    main()
