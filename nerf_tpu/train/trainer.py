"""Training: differentiable volume renderer + train step.

The reference's training path is stubbed (`forward_impl`/`backward_impl`
empty, include/nerf-cuda/nerf_network.h:202-221) while its config schema
(configs/nerf/base.json:2-22) still describes loss + optimizer. This
framework implements the training capability for real, the JAX way:
`jax.value_and_grad` through a differentiable renderer, optax optimizer
chains built from the same config schema, and data parallelism over rays
expressed with sharded batch inputs (XLA inserts the grad all-reduce over
ICI — no NCCL analog needed).

The march/composite inference loop (nerf_tpu/render/march.py) is a
`while_loop` and thus not reverse-differentiable; training uses the
standard fixed-sample stratified renderer (instant-ngp / torch-ngp
training scheme): S uniform samples in [near, far], masked by the
occupancy grid, composited with an exclusive cumprod.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from nerf_tpu.core.types import DENSITY_THRESH, RenderSettings
from nerf_tpu.train.loss import create_loss
from nerf_tpu.train.optimizer import create_optimizer


def _occupancy_mask(density_grid, pos, s: RenderSettings):
    """Occupancy lookup identical to the marcher's (render_utils.h:601-619)."""
    h = s.grid_h
    if s.cascade > 1:
        mx = jnp.max(jnp.abs(pos), axis=-1)
        _, exp = jnp.frexp(mx)
        level = jnp.clip(exp, 0, s.cascade - 1)
        mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), s.bound)
    else:
        level = jnp.zeros(pos.shape[:-1], jnp.int32)
        mip_bound = jnp.full(pos.shape[:-1], s.bound, jnp.float32)
    n = jnp.clip(0.5 * (pos / mip_bound[..., None] + 1.0) * h, 0.0,
                 float(h - 1)).astype(jnp.int32)
    idx = (level * (h ** 3) + n[..., 0] * h * h + n[..., 1] * h + n[..., 2])
    thresh = jnp.float32(min(DENSITY_THRESH, s.mean_density))
    return density_grid[idx] > thresh


def render_train(net, params, rays_o, rays_d, nears, fars,
                 settings: RenderSettings, n_samples: int = 128,
                 key: Optional[jax.Array] = None,
                 density_grid: Optional[jnp.ndarray] = None):
    """Differentiable render: (rgb [N,3], depth [N], weight_sum [N])."""
    s = settings
    n = rays_o.shape[0]
    bound = jnp.float32(s.bound)

    u = jnp.linspace(0.0, 1.0, n_samples + 1)[:-1]  # [S] bin starts
    du = 1.0 / n_samples
    if key is not None:
        u = u + jax.random.uniform(key, (n, n_samples)) * du
    else:
        u = jnp.broadcast_to(u + 0.5 * du, (n, n_samples))
    span = (fars - nears)[:, None]
    t = nears[:, None] + span * u  # [N,S]

    pos = jnp.clip(rays_o[:, None, :] + t[..., None] * rays_d[:, None, :],
                   -bound, bound)
    pos01 = pos / (2.0 * bound) + 0.5
    dir01 = jnp.broadcast_to(rays_d[:, None, :] * 0.5 + 0.5, pos.shape)
    rgb, sigma = net.apply(params, pos01, dir01)
    sigma = sigma * jnp.float32(s.density_scale)
    if density_grid is not None:
        sigma = jnp.where(_occupancy_mask(density_grid, pos, s), sigma, 0.0)

    delta = jnp.concatenate(
        [t[:, 1:] - t[:, :-1], jnp.maximum(fars[:, None] - t[:, -1:], 0.0)],
        axis=-1)
    alpha = 1.0 - jnp.exp(-sigma * delta)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]],
                            axis=-1)  # exclusive
    w = alpha * trans
    w_sum = jnp.sum(w, axis=-1)
    rgb_out = jnp.sum(w[..., None] * rgb, axis=-2) \
        + (1.0 - w_sum)[:, None] * jnp.float32(s.bg_color)
    depth = jnp.sum(w * t, axis=-1)
    return rgb_out, depth, w_sum


@functools.partial(jax.jit,
                   static_argnames=("net", "loss_fn", "tx", "settings",
                                    "n_samples", "brick_reg"))
def train_step(net, loss_fn, tx, settings: RenderSettings, params, opt_state,
               rays_o, rays_d, nears, fars, target_rgb, key,
               n_samples: int = 128, density_grid=None,
               brick_reg: float = 0.0):
    """One optimization step; dp over rays comes from sharded inputs."""

    def objective(p):
        rgb, _, _ = render_train(net, p, rays_o, rays_d, nears, fars,
                                 settings, n_samples=n_samples, key=key,
                                 density_grid=density_grid)
        loss = jnp.mean(loss_fn(rgb, target_rgb))
        if brick_reg:
            # brick-face consistency (TpuGrid): pull the independent
            # copies of shared boundary cells together (VERDICT r2 #6)
            loss = loss + jnp.float32(brick_reg) \
                * net.pos_encoding.brick_consistency_loss(
                    p["pos_encoding"], jax.random.fold_in(key, 0x6B1C))
        return loss

    loss, grads = jax.value_and_grad(objective)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


class Trainer:
    """Config-driven trainer (loss/optimizer otypes from the reference
    config schema, configs/nerf/base.json:2-22)."""

    def __init__(self, net, settings: RenderSettings,
                 loss_config: Optional[Dict] = None,
                 optimizer_config: Optional[Dict] = None,
                 n_samples: int = 128, brick_reg: float = 0.0):
        self.net = net
        self.settings = settings
        self.n_samples = n_samples
        self.brick_reg = float(brick_reg)
        # grid encodings: packed bf16-pair gathers go through bitcasts,
        # which are not reverse-differentiable — train on the f32 path
        enc = getattr(net, "pos_encoding", None)
        if hasattr(enc, "packed_gather"):
            enc.packed_gather = False
        self.loss_fn = create_loss(loss_config or {"otype": "Huber"})
        self.tx, self.ema_decay = create_optimizer(
            optimizer_config or {"otype": "Adam", "learning_rate": 1e-2,
                                 "beta1": 0.9, "beta2": 0.99,
                                 "epsilon": 1e-15})
        self._jit_step = None

    def init_state(self, params) -> Tuple:
        opt_state = self.tx.init(params)
        ema = jax.tree.map(jnp.copy, params) if self.ema_decay else None
        return opt_state, ema

    def step(self, params, opt_state, ema, batch, key, density_grid=None):
        rays_o, rays_d, nears, fars, target = batch
        params, opt_state, loss = train_step(
            self.net, self.loss_fn, self.tx, self.settings, params,
            opt_state, rays_o, rays_d, nears, fars, target, key,
            n_samples=self.n_samples, density_grid=density_grid,
            brick_reg=self.brick_reg)
        if self.ema_decay is not None and ema is not None:
            d = self.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, ema,
                               params)
        return params, opt_state, ema, loss

    def project(self, params):
        """Hard brick-boundary sharing: average duplicated boundary
        cells across rows (TpuGrid dense levels; see
        TpuGridEncoding.project_shared_cells). Call periodically between
        steps — projection approximates parameter tying without touching
        optimizer moments."""
        enc = getattr(self.net, "pos_encoding", None)
        if not hasattr(enc, "project_shared_cells"):
            return params
        if not hasattr(self, "_jit_project"):
            self._jit_project = jax.jit(enc.project_shared_cells)
        out = dict(params)
        out["pos_encoding"] = self._jit_project(params["pos_encoding"])
        return out
