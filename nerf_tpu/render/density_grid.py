"""Occupancy / density-grid maintenance.

Reference parity: `NerfRender::generate_density_grid`
(src/nerf_render.cu:388-429) and its kernels `init_xyzs`, `dd_scale`,
`add_random`, `dg_update` (render_utils.h:79-128):
  - H^3 lattice of cell-center positions in [-1, 1] per axis
  - per cascade c: scale to (bound_c - half_cell) with bound_c =
    min(2^c, bound), jitter by +-half_cell
  - density-network eval (the reference has this line commented out —
    nerf_render.cu:415 — so its grid only ever comes from the snapshot;
    here it is implemented for real, enabling online grid refresh and
    training)
  - EMA-style update: grid = max(grid * decay, new) where grid >= 0,
    decay 0.95 (render_utils.h:120-128, nerf_render.cu:392)

Deviations (documented): the reference updates only cascade 0 after the
loop and resets the grid to 1/64 on every call; we update every cascade
in place and make the reset opt-in.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from nerf_tpu.core.types import RenderSettings

DENSITY_SCALE_CONST = 0.001691  # dd_scale k (nerf_render.cu:417)
DECAY = 0.95                    # nerf_render.cu:392


def lattice_positions(h: int) -> jnp.ndarray:
    """init_xyzs (render_utils.h:90-106): [H^3, 3] in [-1, 1],
    x-major (x = idx // H^2, z = idx % H)."""
    ids = jnp.arange(h ** 3, dtype=jnp.int32)
    x = ids // (h * h)
    y = (ids % (h * h)) // h
    z = ids % h
    coords = jnp.stack([x, y, z], -1).astype(jnp.float32)
    return -1.0 + 2.0 / (h - 1) * coords


@functools.partial(jax.jit, static_argnames=("net", "settings", "reset"))
def generate_density_grid(net, params, density_grid, settings: RenderSettings,
                          key: Optional[jax.Array] = None,
                          decay: float = DECAY,
                          scale_const: float = DENSITY_SCALE_CONST,
                          reset: bool = False) -> jnp.ndarray:
    """Refresh the [cascade * H^3] density grid from the network."""
    s = settings
    h = s.grid_h
    if reset:
        density_grid = jnp.full_like(density_grid, 1.0 / 64)  # :393

    xyzs = lattice_positions(h)  # [H^3, 3]
    if key is None:
        key = jax.random.PRNGKey(0)

    sections = []
    for cas in range(s.cascade):
        bound_c = min(float(1 << cas), s.bound)  # :409
        half = bound_c / h                       # :410
        pos = xyzs * (bound_c - half)            # dd_scale :412
        k = jax.random.fold_in(key, cas)
        pos = pos + half * (2.0 * jax.random.uniform(k, pos.shape) - 1.0)

        # the step the reference left commented out (:415), now live:
        pos01 = pos / (2.0 * s.bound) + 0.5
        sigma = net.density(params, pos01)
        new_density = sigma * jnp.float32(scale_const)  # dd_scale :417

        old = density_grid[cas * h ** 3:(cas + 1) * h ** 3]
        upd = jnp.where(old >= 0,
                        jnp.maximum(old * jnp.float32(decay), new_density),
                        old)  # dg_update (render_utils.h:120-128)
        sections.append(upd)
    return jnp.concatenate(sections)


@functools.partial(jax.jit, static_argnames=("grid_h", "cascade", "cap"))
def build_skip_field(density_grid, density_thresh, grid_h: int,
                     cascade: int = 1, cap: int = 32) -> jnp.ndarray:
    """Chebyshev distance-to-occupied field for long-range empty-space
    skipping (the TPU answer to the reference's bitfield march variant,
    render_utils.h:417-522 — see march.py for why a bitfield itself buys
    nothing under XLA's descriptor-bound gathers).

    Returns int32 [cascade * H^3], same x-major cell order as the density
    grid: 0 = occupied (density > density_thresh, the marcher's test at
    render_utils.h:619); k >= 1 = every cell within chebyshev radius k-1
    of this cell is empty, capped at `cap`. A ray anywhere inside a cell
    with value v can therefore advance (v-1) * cell_size along ANY
    direction without entering an occupied cell.

    Built by cap-1 iterations of d = min(d, minpool_3x3x3(d) + 1) with
    the pool separable into three 3-tap axis mins; cells outside the grid
    are treated as empty (pad = cap), matching the marcher's far-clipping.
    One-time per density-grid update (~100 cheap elementwise passes).
    """
    h = grid_h
    occ = (density_grid > density_thresh).reshape(cascade, h, h, h)
    d = jnp.where(occ, 0, cap).astype(jnp.int32)

    def axis_min3(a, axis):
        pad = [(0, 0)] * 4
        pad[axis] = (1, 1)
        p = jnp.pad(a, pad, constant_values=cap)
        lo = jax.lax.slice_in_dim(p, 0, h, axis=axis)
        hi = jax.lax.slice_in_dim(p, 2, h + 2, axis=axis)
        return jnp.minimum(a, jnp.minimum(lo, hi))

    for _ in range(cap - 1):
        m = d
        for ax in (1, 2, 3):
            m = axis_min3(m, ax)
        d = jnp.minimum(d, m + 1)
    return d.reshape(-1)


def pack_skip_field(field: jnp.ndarray, w: int) -> jnp.ndarray:
    """Pack a flat skip field [cascade*H^3] into [cascade*H^3/w, w] gather
    rows of w consecutive-z cells. Width-2/4 row gathers run ~1.56x the
    width-1 descriptor rate on v5e (bench_gather.py; see
    RenderSettings.skip_row_w) — the marcher gathers row idx>>log2(w) and
    lane-selects cell idx&(w-1). Values are unchanged; H^3 is divisible
    by any supported w (H is a power of two >= 8)."""
    if w == 1:
        return field
    if w not in (2, 4):
        raise ValueError(f"skip_row_w must be 1, 2 or 4: {w}")
    if field.shape[0] % w:
        raise ValueError("field length not divisible by row width")
    return field.reshape(-1, w)


def mean_density(density_grid: jnp.ndarray) -> jnp.ndarray:
    """Mean over non-negative cells (snapshot `mean_density` analog)."""
    valid = density_grid >= 0
    return jnp.sum(jnp.where(valid, density_grid, 0.0)) \
        / jnp.maximum(jnp.sum(valid), 1)
