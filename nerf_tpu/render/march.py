"""Occupancy-grid ray marching + volume compositing — the hot path.

Reference parity: the per-frame render loop of
`NerfRender::render_frame` (src/nerf_render.cu:238-367) with its kernels
`kernel_march_rays` (render_utils.h:524-655), `kernel_composite_rays`
(render_utils.h:658-751) and `get_image_and_depth` (render_utils.h:241-265).

TPU redesign (replaces the CUDA dynamic-compaction loop):
  The reference compacts alive rays each iteration via atomicAdd
  (render_utils.h:394-415) and round-trips the alive counter to the host
  (nerf_render.cu:288-292). Neither survives XLA's static-shape model, and
  the host sync would serialize the device. Instead:
    - one `lax.while_loop` over march ROUNDS, all rays resident, liveness
      as a mask; loop exits when no ray is alive (on-device reduction, no
      host sync)
    - per round each alive ray emits up to `samples_per_round` samples
      using at most `probes_per_round` occupancy probes (VPU-vectorized
      over all rays); the reference's data-dependent voxel-skip do-while
      (render_utils.h:648-651) becomes a bounded masked inner loop
    - the sample batch [N, S] feeds ONE network evaluation per round
      (MXU matmul chain), exactly like the reference's
      concat -> inference -> decompose (nerf_render.cu:315-329)
    - compositing is a fixed-length scan over the S sample slots with the
      reference's alpha/T/early-termination math (render_utils.h:698-743)

  Semantics deltas (documented, all strictly result-preserving):
    - rays that exhaust their probe budget mid-round simply continue next
      round instead of being mistaken for dead (the reference cannot hit
      this case because its march loop is unbounded);
    - voxel skips after the round's last emission are retained (the
      reference re-marches them next round — pure wasted work).
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from nerf_tpu.core.types import (
    DENSITY_THRESH,
    MIN_STEPSIZE,
    RenderSettings,
)


class RenderResult(NamedTuple):
    rgb: jnp.ndarray         # [N, 3] bg-composited linear color
    depth: jnp.ndarray       # [N] normalized to [0,1] between near/far
    weight_sum: jnp.ndarray  # [N] accumulated alpha
    n_rounds: jnp.ndarray    # [] number of march rounds executed


def _mip_level(x, cascade: int):
    """mip_from_pos (render_utils.h:148-155): frexp exponent of max |coord|."""
    mx = jnp.max(jnp.abs(x), axis=-1)
    _, exp = jnp.frexp(mx)
    return jnp.clip(exp, 0, cascade - 1)


def _march_round(t, last_t, alive, rays_o, rays_d, far, density_grid,
                 s: RenderSettings):
    """One round of sample generation for all rays.

    Returns (t_new, smp_xyz [N,S,3], smp_dt [N,S], smp_rd [N,S],
    emit [N] number of emitted samples).
    Mirrors kernel_march_rays (render_utils.h:524-655) vectorized over rays.
    """
    n = t.shape[0]
    S, P = s.samples_per_round, s.probes_per_round
    h = s.grid_h
    bound = jnp.float32(s.bound)
    dt_gamma = jnp.float32(s.dt_gamma)
    dt_min = jnp.float32(MIN_STEPSIZE)             # render_utils.h:579
    dt_max = jnp.float32(2.0 * s.bound / s.grid_h)  # render_utils.h:580
    density_thresh = jnp.float32(min(DENSITY_THRESH, s.mean_density))

    rd_inv = 1.0 / rays_d
    sgn = jnp.copysign(jnp.float32(1.0), rays_d)  # signf (render_utils.h:145)
    slot_iota = jnp.arange(S, dtype=jnp.int32)

    smp_xyz0 = jnp.zeros((n, S, 3), jnp.float32)
    smp_dt0 = jnp.zeros((n, S), jnp.float32)
    smp_rd0 = jnp.zeros((n, S), jnp.float32)
    emit0 = jnp.zeros((n,), jnp.int32)
    done0 = ~alive

    def probe(_, carry):
        t, last_t, emit, done, sx, sdt, srd = carry
        active = ~done & (t < far)

        x = jnp.clip(rays_o + t[:, None] * rays_d, -bound, bound)  # :595-597
        if s.cascade > 1:
            level = _mip_level(x, s.cascade)                       # :601
            mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)),
                                    bound)                         # :602
        else:
            level = jnp.zeros((n,), jnp.int32)
            mip_bound = jnp.broadcast_to(bound, (n,))
        nxyz = jnp.clip(0.5 * (x / mip_bound[:, None] + 1.0) * h,
                        0.0, float(h - 1)).astype(jnp.int32)       # :606-611
        idx = (level * (h * h * h) + nxyz[:, 0] * (h * h)
               + nxyz[:, 1] * h + nxyz[:, 2])                      # :613-614
        density = density_grid[idx]
        occ = density > density_thresh                             # :619

        dt = jnp.clip(t * dt_gamma, dt_min, dt_max)                # :628
        emit_now = active & occ & (emit < S)
        freeze = active & occ & (emit >= S)
        skip_now = active & ~occ

        # --- emission (:621-637) -------------------------------------
        t_emit = t + dt
        onehot = emit_now[:, None] & (slot_iota[None, :] == emit[:, None])
        sx = jnp.where(onehot[..., None], x[:, None, :], sx)
        sdt = jnp.where(onehot, dt[:, None], sdt)
        srd = jnp.where(onehot, (t_emit - last_t)[:, None], srd)

        # --- voxel skip (:641-651) ------------------------------------
        bnd = ((nxyz.astype(jnp.float32) + 0.5 + 0.5 * sgn)
               / float(h - 1) * 2.0 - 1.0) * mip_bound[:, None]
        t_axes = (bnd - x) * rd_inv
        tt = t + jnp.maximum(0.0, jnp.min(t_axes, axis=-1))
        t_skip = t + dt  # do-while executes once unconditionally

        def skip_step(_, ts):
            step = jnp.clip(ts * dt_gamma, dt_min, dt_max)
            return jnp.where(ts < tt, ts + step, ts)

        t_skip = jax.lax.fori_loop(0, s.skip_iters, skip_step, t_skip)

        t_new = jnp.where(emit_now, t_emit, jnp.where(skip_now, t_skip, t))
        last_t = jnp.where(emit_now, t_emit, last_t)
        emit = emit + emit_now.astype(jnp.int32)
        done = done | freeze
        return t_new, last_t, emit, done, sx, sdt, srd

    t, last_t, emit, _, sx, sdt, srd = jax.lax.fori_loop(
        0, P, probe, (t, last_t, emit0, done0, smp_xyz0, smp_dt0, smp_rd0))
    return t, sx, sdt, srd, emit


def _composite_round(smp_rgb, smp_sigma, smp_dt, smp_rd, emit, t_round_start,
                     weight_sum, depth, rgb_acc):
    """kernel_composite_rays (render_utils.h:658-751) as a scan over slots.

    Returns updated (weight_sum, depth, rgb_acc, terminated [N]).
    """
    n, S = smp_dt.shape

    def body(carry, slot):
        w_sum, d, racc, t_c, term = carry
        valid = (slot < emit) & ~term          # delta==0 break (:701)
        alpha = 1.0 - jnp.exp(-smp_sigma[:, slot] * smp_dt[:, slot])  # :703
        big_t = 1.0 - w_sum                                           # :712
        w = alpha * big_t                                             # :713
        wv = jnp.where(valid, w, 0.0)
        t_c = t_c + jnp.where(valid, smp_rd[:, slot], 0.0)            # :716
        d = d + wv * t_c                                              # :717
        racc = racc + wv[:, None] * smp_rgb[:, slot, :]               # :718-720
        w_sum = w_sum + wv
        term = term | (valid & (big_t < 1e-4))                        # :727
        return (w_sum, d, racc, t_c, term), None

    init = (weight_sum, depth, rgb_acc, t_round_start,
            jnp.zeros((n,), bool))
    (w_sum, d, racc, _, term), _ = jax.lax.scan(
        body, init, jnp.arange(S, dtype=jnp.int32))
    return w_sum, d, racc, term


@functools.partial(jax.jit, static_argnames=("apply_fn", "settings"))
def render_rays(apply_fn: Callable, params, density_grid, rays_o, rays_d,
                nears, fars, settings: RenderSettings) -> RenderResult:
    """Render a batch of rays to (rgb, depth, weight_sum).

    apply_fn(params, pos01, dir01) -> (rgb [...,3], sigma [...]) — the
    NerfNetwork forward (oracle or fused-Pallas variant).
    One fused jit: ray init, march-round while_loop, background blend
    (nerf_render.cu:238-343 without any host round-trips).
    """
    s = settings
    n = rays_o.shape[0]
    bound = jnp.float32(s.bound)

    t0 = nears  # init_step0 (render_utils.h:221-239)
    state0 = dict(
        t=t0,
        alive=t0 < fars,
        weight_sum=jnp.zeros((n,), jnp.float32),
        depth=jnp.zeros((n,), jnp.float32),
        rgb=jnp.zeros((n, 3), jnp.float32),
        rounds=jnp.int32(0),
    )

    def cond(st):
        return (st["rounds"] < s.max_rounds) & jnp.any(st["alive"])

    def body(st):
        t_new, sx, sdt, srd, emit = _march_round(
            st["t"], st["t"], st["alive"], rays_o, rays_d, fars,
            density_grid, s)

        # Network eval (nerf_render.cu:311-329): normalize inputs exactly as
        # the two linear_transformer calls, then one batched forward.
        pos01 = sx / (2.0 * bound) + 0.5
        dir01 = jnp.broadcast_to(rays_d[:, None, :] * 0.5 + 0.5, sx.shape)
        rgb_s, sigma_s = apply_fn(params, pos01, dir01)
        if s.density_scale != 1.0:
            sigma_s = sigma_s * jnp.float32(s.density_scale)  # :328-329

        w_sum, d, racc, term = _composite_round(
            rgb_s, sigma_s, sdt, srd, emit, st["t"], st["weight_sum"],
            st["depth"], st["rgb"])

        alive = st["alive"] & ~term & (t_new < fars)
        return dict(t=t_new, alive=alive, weight_sum=w_sum, depth=d,
                    rgb=racc, rounds=st["rounds"] + 1)

    st = jax.lax.while_loop(cond, body, state0)

    # get_image_and_depth (render_utils.h:241-265)
    rgb = st["rgb"] + (1.0 - st["weight_sum"])[:, None] * jnp.float32(s.bg_color)
    span = fars - nears
    depth = jnp.where(span > 0,
                      jnp.maximum(st["depth"] - nears, 0.0)
                      / jnp.where(span > 0, span, 1.0),
                      0.0)
    return RenderResult(rgb=rgb, depth=depth, weight_sum=st["weight_sum"],
                        n_rounds=st["rounds"])
