"""Occupancy-grid ray marching + volume compositing — the hot path.

Reference parity: the per-frame render loop of
`NerfRender::render_frame` (src/nerf_render.cu:238-367) with its kernels
`kernel_march_rays` (render_utils.h:524-655), `kernel_composite_rays`
(render_utils.h:658-751) and `get_image_and_depth` (render_utils.h:241-265).

TPU redesign (replaces the CUDA dynamic-compaction loop):
  The reference compacts alive rays each iteration via atomicAdd
  (render_utils.h:394-415) and round-trips the alive counter to the host
  (nerf_render.cu:288-292). Neither survives XLA's static-shape model.
  Two drivers, bit-identical outputs (tested against each other and
  against the step-exact NumPy port in tests/reference_sim.py):

  1. THE HOST-LOOP PATH (default; the measured fast path, BASELINE.md):
     frames render in fixed ray chunks, round-robined as lockstep WAVES.
     Per chunk-round, one jitted program (_round_march_deep) runs a
     VECTORIZED march: the reference's t-sequence is the occupancy-
     independent recurrence t += clamp(t*dt_gamma), so the whole
     trajectory is closed-form — an unrolled P-step trajectory, ONE
     batched [P*m] occupancy gather, and an unrolled emission pass that
     reproduces the voxel-skip do-while's no-emission windows exactly
     (skip "shadows", carried across rounds). Emitted samples compact via
     a cumsum permutation; the network evaluates either ALL lanes (dense
     rounds) or a bucket-size per-channel gather, and compositing
     scatter-adds per-round deltas into full-chunk accumulators. Rays
     compact across rounds through a bucket ladder. The host reads ONE
     concatenated count array per wave (~26ms relay RTT, non-overlapping)
     and makes the static-shape decisions: bucket sizes, compaction,
     termination. A shard_mapped variant (_ShardedRounds) runs the same
     loop over a ray mesh with per-device local compaction.

  2. THE DEVICE PATH (render_rays): one `lax.while_loop` over march
     rounds per chunk via `lax.map`, all rays resident, liveness as a
     mask, zero host syncs — fully jittable, used as the equality oracle
     and wherever a single XLA program is required.

  Layout: every hot array is CHANNEL-FIRST with the ray/sample batch axis
  minor-most ([3, P, N], [P, N], [N]) so fp32 (8,128) tiles never pad —
  the TPU analog of tcnn's SoA matrices (matrix_layout.h:37-47).
  Sample-major rows measured a 16x HBM write amplification (minor dims
  <128 pad to 128 lanes); channels-last [N, S, 16] measured 8x.
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
    n_rounds: jnp.ndarray    # [] march rounds executed (max over chunks)


def _max_host_rounds(s: RenderSettings) -> int:
    """Wave cap for the host-loop drivers, derived from worst-case
    trajectory length: the deep march advances every live ray by exactly
    probes_per_round steps of >= MIN_STEPSIZE per round, and a trajectory
    is at most the aabb diagonal long (ADVICE r2: the old emission-budget
    cap could finalize frames with rays still alive for bound>2 scenes).
    Freeze rounds (cap_emit / bucket exhaustion) don't advance frozen
    rays, but every such round consumes emission budget — per-ray
    (cap_emit) or per-chunk (>= bucket samples emitted whenever any ray
    bucket-freezes) — so both freeze mechanisms add at most an
    emission-budget term to the cap."""
    import math

    span = math.dist(s.aabb[:3], s.aabb[3:])
    traj = int(math.ceil(
        span / MIN_STEPSIZE / max(1, s.probes_per_round)))
    cap = int(s.cap_emit) if s.cap_emit else s.probes_per_round
    emit = -(-s.max_infer_steps // max(1, cap))
    if s.bucket_set:
        emit = max(emit, -(-s.ray_chunk * s.max_infer_steps
                           // max(1, min(s.bucket_set))))
    return traj + emit + 8


def _skip_trip_bound(s: RenderSettings) -> int:
    """Exact trip bound for the voxel-skip do-while: each step is
    >= MIN_STEPSIZE and the remaining distance to the voxel exit is at
    most the voxel diagonal sqrt(3)*2*bound/H, inflated by the
    reference's H/(H-1) boundary quirk. Margin +2 for the float edges;
    skip_iters remains the user-facing cap."""
    import math

    diag = math.sqrt(3.0) * 2.0 * s.bound / s.grid_h
    diag *= s.grid_h / max(1, s.grid_h - 1)
    return min(s.skip_iters, int(math.ceil(diag / MIN_STEPSIZE)) + 2)


def _mip_level(x_cf, cascade: int):
    """mip_from_pos (render_utils.h:148-155): frexp exponent of max |coord|.

    x_cf: [3, N] -> level [N]."""
    mx = jnp.max(jnp.abs(x_cf), axis=0)
    _, exp = jnp.frexp(mx)
    return jnp.clip(exp, 0, cascade - 1)


def _march_round(t, alive, rays_o, rays_d, far, density_grid,
                 s: RenderSettings, round_idx=None, perturb_seed=None,
                 s_round=None):
    """One round of sample generation for all rays (channel-first).

    rays_o/rays_d: [3, N]. Returns (t_new [N], smp_xyz [3, S, N],
    smp_dt [S, N], smp_rd [S, N], emit [N]).
    Mirrors kernel_march_rays (render_utils.h:524-655) vectorized over rays.
    s_round statically overrides samples_per_round (the reference's
    adaptive num_step, nerf_render.cu:300).
    """
    n = t.shape[0]
    S = s_round if s_round is not None else s.samples_per_round
    P = s.probes_per_round
    h = s.grid_h
    bound = jnp.float32(s.bound)
    dt_gamma = jnp.float32(s.dt_gamma)
    dt_min = jnp.float32(MIN_STEPSIZE)             # render_utils.h:579
    dt_max = jnp.float32(2.0 * s.bound / s.grid_h)  # render_utils.h:580
    density_thresh = jnp.float32(min(DENSITY_THRESH, s.mean_density))

    rd_inv = 1.0 / rays_d
    sgn = jnp.copysign(jnp.float32(1.0), rays_d)  # signf (render_utils.h:145)
    slot_iota = jnp.arange(S, dtype=jnp.int32)

    if s.perturb and round_idx is not None:
        # per-round stochastic start jitter (render_utils.h:586-589; the
        # reference seeds pcg32(ray, perturb) each march call). The seed is
        # traced so spp accumulation varies it without recompiling.
        seed = jnp.int32(s.perturb) if perturb_seed is None else perturb_seed
        key = jax.random.fold_in(jax.random.PRNGKey(seed), round_idx)
        t = t + jnp.float32(MIN_STEPSIZE) \
            * jax.random.uniform(key, t.shape)

    smp_xyz0 = jnp.zeros((3, S, n), jnp.float32)
    smp_dt0 = jnp.zeros((S, n), jnp.float32)
    smp_rd0 = jnp.zeros((S, n), jnp.float32)
    emit0 = jnp.zeros((n,), jnp.int32)
    done0 = ~alive

    def probe(carry):
        i, t, last_t, emit, done, sx, sdt, srd = carry
        active = ~done & (t < far)

        x = jnp.clip(rays_o + t[None, :] * rays_d, -bound, bound)  # :595-597
        if s.cascade > 1:
            level = _mip_level(x, s.cascade)                       # :601
            mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)),
                                    bound)                         # :602
        else:
            mip_bound = jnp.broadcast_to(bound, (n,))
            level = None
        nxyz = jnp.clip(0.5 * (x / mip_bound[None, :] + 1.0) * h,
                        0.0, float(h - 1)).astype(jnp.int32)       # :606-611
        idx = nxyz[0] * (h * h) + nxyz[1] * h + nxyz[2]            # :613-614
        if level is not None:
            idx = idx + level * (h * h * h)
        density = density_grid[idx]
        occ = density > density_thresh                             # :619

        dt = jnp.clip(t * dt_gamma, dt_min, dt_max)                # :628
        emit_now = active & occ & (emit < S)
        freeze = active & occ & (emit >= S)
        skip_now = active & ~occ

        # --- emission (:621-637) -------------------------------------
        t_emit = t + dt
        onehot = emit_now[None, :] & (slot_iota[:, None] == emit[None, :])
        sx = jnp.where(onehot[None, :, :], x[:, None, :], sx)
        sdt = jnp.where(onehot, dt[None, :], sdt)
        srd = jnp.where(onehot, (t_emit - last_t)[None, :], srd)

        # --- voxel skip (:641-651) ------------------------------------
        # The reference's do-while steps until t >= tt even when tt
        # overshoots into the next voxel (its boundary formula divides by
        # H-1 while the quantization divides by H) — occupied-voxel entry
        # points can be deliberately skipped past. Reproduced exactly with
        # a FIXED-trip fori_loop: dt >= dt_min bounds the trip count at
        # ceil(voxel diagonal / dt_min) (see _skip_trip_bound) and a fixed
        # trip count avoids the per-iteration any() reduction that made a
        # while_loop here cost ~1ms/probe (BASELINE.md).
        bnd = ((nxyz.astype(jnp.float32) + 0.5 + 0.5 * sgn)
               / float(h - 1) * 2.0 - 1.0) * mip_bound[None, :]
        t_axes = (bnd - x) * rd_inv
        tt = t + jnp.maximum(0.0, jnp.min(t_axes, axis=0))
        tt_eff = jnp.where(skip_now, tt, -jnp.inf)
        t_skip = t + dt  # do-while executes once unconditionally

        def skip_step(k, ts):
            step = jnp.clip(ts * dt_gamma, dt_min, dt_max)
            return jnp.where(ts < tt_eff, ts + step, ts)

        t_skip = jax.lax.fori_loop(0, _skip_trip_bound(s), skip_step,
                                   t_skip)

        t_new = jnp.where(emit_now, t_emit, jnp.where(skip_now, t_skip, t))
        last_t = jnp.where(emit_now, t_emit, last_t)
        emit = emit + emit_now.astype(jnp.int32)
        done = done | freeze
        return i + 1, t_new, last_t, emit, done, sx, sdt, srd

    def probe_cond(carry):
        # stop early once no ray can still emit this round (the reference
        # marcher exits at step == n_step, render_utils.h:593)
        i, t, _, emit, done, *_ = carry
        return (i < P) & jnp.any(~done & (t < far) & (emit < S))

    _, t, _, emit, _, sx, sdt, srd = jax.lax.while_loop(
        probe_cond, probe,
        (jnp.int32(0), t, t, emit0, done0, smp_xyz0, smp_dt0, smp_rd0))
    return t, sx, sdt, srd, emit


def _composite_parallel(smp_rgb, smp_sigma, smp_dt, smp_rd, m,
                        t_round_start, weight_sum, depth, rgb_acc):
    """kernel_composite_rays (render_utils.h:658-751), log-depth form.

    The reference loop is sequential only through the transmittance
    product T_k = T_in * prod_{j<k}(1 - alpha_j) and the early-exit at
    T < 1e-4 (:712-727). Both are closed-form: a masked exclusive cumprod
    gives every slot's incoming T at once, and because T is monotone
    non-increasing along valid slots the termination point is simply the
    first valid slot whose incoming T is < 1e-4 (pre-termination values
    of the unterminated cumprod agree exactly with the sequential loop,
    so the cut index matches). Replaces a 32-iteration lax.scan whose
    per-slot steps measured ~0.1ms each (ROUND2_NOTES: composite was
    ~0.5s of a 4.8s frame); cumprod/cumsum over the small slot axis fuse
    into a handful of elementwise passes.

    m [S, N] bool: slot validity. Returns (weight_sum [N], depth [N],
    rgb_acc [3, N], terminated [N]).
    """
    n = smp_dt.shape[1]
    alpha = 1.0 - jnp.exp(-smp_sigma * smp_dt)                  # :703
    am = jnp.where(m, alpha, 0.0)
    cum = jnp.cumprod(1.0 - am, axis=0)
    cum_excl = jnp.concatenate(
        [jnp.ones((1, n), jnp.float32), cum[:-1]], axis=0)
    big_t = (1.0 - weight_sum)[None, :] * cum_excl              # :712
    q = m & (big_t < 1e-4)                                      # :727
    fired = jnp.cumsum(q.astype(jnp.int32), axis=0) > 0
    term_before = jnp.concatenate(
        [jnp.zeros((1, n), bool), fired[:-1]], axis=0)
    keep = m & ~term_before
    w = jnp.where(keep, alpha * big_t, 0.0)                     # :713
    t_c = t_round_start[None, :] + jnp.cumsum(
        jnp.where(keep, smp_rd, 0.0), axis=0)                   # :716
    d = depth + jnp.sum(w * t_c, axis=0)                        # :717
    racc = rgb_acc + jnp.sum(w[None, :, :] * smp_rgb, axis=1)   # :718-720
    w_sum = weight_sum + jnp.sum(w, axis=0)
    term = jnp.any(q, axis=0)
    return w_sum, d, racc, term


def _composite_round(smp_rgb, smp_sigma, smp_dt, smp_rd, emit, t_round_start,
                     weight_sum, depth, rgb_acc):
    """Slot-count masked composite: slot k of a ray is valid iff k < emit
    (the reference's `step` budget per march call). smp_rgb [3, S, N],
    smp_sigma/dt/rd [S, N]."""
    slots = jnp.arange(smp_dt.shape[0], dtype=jnp.int32)
    m = slots[:, None] < emit[None, :]
    return _composite_parallel(smp_rgb, smp_sigma, smp_dt, smp_rd, m,
                               t_round_start, weight_sum, depth, rgb_acc)


def _render_chunk(apply_fn: Callable, params, density_grid, rays_o_cf,
                  rays_d_cf, nears, fars, s: RenderSettings,
                  perturb_seed=None):
    """Render one chunk of rays; all channel-first. Returns
    (rgb [3, N], depth [N], weight_sum [N], rounds)."""
    n = nears.shape[0]
    bound = jnp.float32(s.bound)

    state0 = dict(
        t=nears,  # init_step0 (render_utils.h:221-239)
        alive=nears < fars,
        weight_sum=jnp.zeros((n,), jnp.float32),
        depth=jnp.zeros((n,), jnp.float32),
        rgb=jnp.zeros((3, n), jnp.float32),
        rounds=jnp.int32(0),
    )

    def cond(st):
        return (st["rounds"] < s.max_rounds) & jnp.any(st["alive"])

    def body(st):
        t_new, sx, sdt, srd, emit = _march_round(
            st["t"], st["alive"], rays_o_cf, rays_d_cf, fars,
            density_grid, s, round_idx=st["rounds"],
            perturb_seed=perturb_seed)

        def eval_and_composite(op):
            sx, sdt, srd, emit, t0, w0, d0, rgb0 = op
            # Network eval (nerf_render.cu:311-329): normalize inputs
            # exactly as the two linear_transformer calls, then one
            # batched forward.
            S = s.samples_per_round
            pos01 = sx.reshape(3, S * n) / (2.0 * bound) + 0.5
            dir01 = jnp.broadcast_to(rays_d_cf[:, None, :] * 0.5 + 0.5,
                                     (3, S, n)).reshape(3, S * n)
            rgb_s, sigma_s = apply_fn(params, pos01, dir01)
            if s.density_scale != 1.0:
                sigma_s = sigma_s * jnp.float32(s.density_scale)  # :328-329
            rgb_s = rgb_s.reshape(3, S, n)
            sigma_s = sigma_s.reshape(S, n)
            return _composite_round(rgb_s, sigma_s, sdt, srd, emit, t0, w0,
                                    d0, rgb0)

        def no_samples(op):
            _, _, _, _, _, w0, d0, rgb0 = op
            return w0, d0, rgb0, jnp.zeros(n, bool)

        # pure empty-space-traversal rounds skip the network entirely (the
        # reference can't hit this case — its march only returns once
        # samples exist or rays are exhausted)
        w_sum, d, racc, term = jax.lax.cond(
            jnp.any(emit > 0), eval_and_composite, no_samples,
            (sx, sdt, srd, emit, st["t"], st["weight_sum"], st["depth"],
             st["rgb"]))

        alive = st["alive"] & ~term & (t_new < fars)
        return dict(t=t_new, alive=alive, weight_sum=w_sum, depth=d,
                    rgb=racc, rounds=st["rounds"] + 1)

    st = jax.lax.while_loop(cond, body, state0)

    # get_image_and_depth (render_utils.h:241-265)
    rgb = st["rgb"] + (1.0 - st["weight_sum"])[None, :] \
        * jnp.float32(s.bg_color)
    span = fars - nears
    depth = jnp.where(span > 0,
                      jnp.maximum(st["depth"] - nears, 0.0)
                      / jnp.where(span > 0, span, 1.0),
                      0.0)
    return rgb, depth, st["weight_sum"], st["rounds"]


_FLT_MAX = jnp.float32(3.4028235e38)


def _skip_lookup(skip_field, idx):
    """Gather chebyshev distance-to-occupied for cell ids `idx` (any
    shape) from a flat [C*H^3] or width-packed [C*H^3/w, w] skip field
    (density_grid.py:pack_skip_field). One descriptor per probe either
    way, but width-2/4 rows run ~1.56x the width-1 descriptor rate on
    v5e (bench_gather.py) — gather the w-cell row and lane-select the
    probe's cell with vectorized wheres."""
    if skip_field.ndim == 2:
        w = skip_field.shape[1]
        g = skip_field[idx // w]                # [..., w]
        lane = idx % w
        if w == 4:
            b1 = (lane >= 2)[..., None]
            pair = jnp.where(b1, g[..., 2:4], g[..., 0:2])
            return jnp.where((lane & 1) == 1, pair[..., 1], pair[..., 0])
        return jnp.where((lane & 1) == 1, g[..., 1], g[..., 0])  # w == 2
    return skip_field[idx]


def _march_round_deep(t, alive, rays_o, rays_d, far, density_grid,
                      s: RenderSettings, n_emit, shadow, round_idx=None,
                      perturb_seed=None, skip_field=None, bucket=None,
                      want_slots=False):
    """Vectorized march: P trajectory steps per ray per round.

    The key structural fact (verified against kernel_march_rays,
    render_utils.h:524-655): the reference's t-sequence is the pure
    recurrence t_{k+1} = t_k + clamp(t_k*dt_gamma, dt_min, dt_max)
    REGARDLESS of occupancy — the voxel-skip do-while advances t by the
    same rule and exists only to avoid per-step occupancy lookups on a
    GPU. On TPU the economics invert: one BATCHED [P*m] occupancy gather
    runs at full descriptor rate, while P small per-probe gathers each
    pay ~0.4ms of fixed overhead plus ~0.7ms/iteration of loop machinery
    (measured: 85ms/round sequential vs ~20ms batched at m=65536, P=32).

    Three fully unrolled passes, no lax control flow:
      1. trajectory + voxel ids [P, m] (closed form from t),
      2. ONE gather of all P*m occupancy probes,
      3. emission logic with the reference's skip-shadow semantics: a
         step inside an empty voxel opens a no-emission shadow until the
         tt boundary (computed with the reference's H-1 overshoot quirk);
         shadowed steps never emit even if they land in occupied voxels —
         exactly the do-while's intermediate steps. `shadow` [m] carries
         a shadow across round boundaries (the reference's loop has no
         round boundaries to reset it).

    n_emit [m]: cumulative samples emitted per ray (the reference's
    per-ray step budget, m_max_infer_steps).

    skip_field (optional int32 [cascade*H^3], build_skip_field): chebyshev
    distance-to-occupied per cell. Replaces the density-threshold compare
    (df == 0 <=> density > thresh by construction) AND enables a
    LATTICE-EXACT EMPTY-SPACE EXTENSION — the TPU answer to the
    reference's morton-bitfield march (render_utils.h:417-522). A
    bitfield buys nothing here: XLA gathers are descriptor-bound, so 32
    cells per u32 word still costs one descriptor per probe (no dedup
    across probes). What *does* cut march work is advancing t WITHOUT
    gathers: after the P gathered probes, the trajectory recurrence
    continues for up to s.extend_steps additional steps, each adopted
    only while its cell provably lies inside the LAST probe's free ball
    (|cell - cell_last|_inf <= df_last - 1 — every such cell is empty by
    construction of the field). Because each extension step is the exact
    same float fold t += clamp(t*dt_gamma, ...), the emitted-sample
    t-lattice (and hence the emission set) is BIT-IDENTICAL to the
    no-skip march in every dt regime — full-frame output differs only by
    round-partition reassociation ULPs (skipping repacks which samples
    share a composite round; the same equivalence class as changing the
    S/P knobs, tests/test_render.py::test_round_partition_invariance);
    the reference's skip-shadow recurrence (tt with the H-1 overshoot
    quirk) is replayed arithmetically over the adopted steps so
    empty->occupied transitions after the extension mask emissions
    exactly as the do-while would. Under cascade > 1 each ball lives in
    ITS probe's mip (the field stores one chebyshev slab per mip) and
    adoption additionally requires the step's own mip_from_pos level to
    equal the ball's — a skipped lattice point is therefore always one
    the no-skip march would have probed against the same, provably-empty
    mip slab (VERDICT r3 item 5). After the extension, up to
    s.chain_balls CHAINED balls each re-gather the field at the advanced
    position (ONE [m] descriptor per ball vs P*[m] for a probe pass) and
    walk up to s.chain_steps more points.

    bucket (optional int): static per-chunk emission budget for the round
    — see pass 3. None = unlimited (the all-lanes eval never overflows).

    Returns (t_new [m], xs [3,P,m], dts [P,m], rds [P,m], valid [P,m],
    n_emit_new [m], shadow_new [m], frozen_bucket [m] bool, spill []
    int32). The frozen flag reports BUCKET-boundary freezes only (the
    host's escalation signal); cap_emit freezes still stop the ray for
    the round but are not reported — they are routine at surface rounds
    and do not indicate bucket shortage. spill is the exact count of
    samples the bucket deferred this round (see the spill simulator in
    pass 3); 0 when no bucket is active.
    """
    m = t.shape[0]
    P = s.probes_per_round
    h = s.grid_h
    bound = jnp.float32(s.bound)
    dt_gamma = jnp.float32(s.dt_gamma)
    dt_min = jnp.float32(MIN_STEPSIZE)
    dt_max = jnp.float32(2.0 * s.bound / s.grid_h)
    density_thresh = jnp.float32(min(DENSITY_THRESH, s.mean_density))
    max_steps = jnp.int32(s.max_infer_steps)

    rd_inv = 1.0 / rays_d
    sgn = jnp.copysign(jnp.float32(1.0), rays_d)

    if s.perturb and round_idx is not None:
        seed = jnp.int32(s.perturb) if perturb_seed is None else perturb_seed
        key = jax.random.fold_in(jax.random.PRNGKey(seed), round_idx)
        t = t + jnp.float32(MIN_STEPSIZE) \
            * jax.random.uniform(key, t.shape)

    # ---- pass 1: trajectory, voxel ids, skip boundaries (unrolled) ----
    ts, dts_l, xs_l, idx_l, tt_l, lvl_l = [], [], [], [], [], []
    tk = t
    for _ in range(P):
        dt_k = jnp.clip(tk * dt_gamma, dt_min, dt_max)
        x = jnp.clip(rays_o + tk[None, :] * rays_d, -bound, bound)
        if s.cascade > 1:
            level = _mip_level(x, s.cascade)
            mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)),
                                    bound)
        else:
            mip_bound = jnp.broadcast_to(bound, (m,))
            level = None
        nxyz = jnp.clip(0.5 * (x / mip_bound[None, :] + 1.0) * h,
                        0.0, float(h - 1)).astype(jnp.int32)
        idx = nxyz[0] * (h * h) + nxyz[1] * h + nxyz[2]
        if level is not None:
            idx = idx + level * (h * h * h)
        # skip boundary with the reference's H-1 quirk (render_utils.h:
        # 641-647)
        bnd = ((nxyz.astype(jnp.float32) + 0.5 + 0.5 * sgn)
               / float(h - 1) * 2.0 - 1.0) * mip_bound[None, :]
        t_axes = (bnd - x) * rd_inv
        tt = tk + jnp.maximum(0.0, jnp.min(t_axes, axis=0))
        ts.append(tk)
        dts_l.append(dt_k)
        xs_l.append(x)
        idx_l.append(idx)
        tt_l.append(tt)
        lvl_l.append(level)
        tk = tk + dt_k
    t_new = jnp.where(alive, tk, t)

    # ---- pass 2: ONE batched occupancy gather -------------------------
    idx_all = jnp.stack(idx_l, axis=0)          # [P, m]
    if skip_field is not None:
        df_all = _skip_lookup(skip_field, idx_all)  # chebyshev distances
        occ_all = df_all == 0
    else:
        occ_all = density_grid[idx_all] > density_thresh

    # ---- pass 3: emission with skip-shadow semantics (unrolled) -------
    # Two FREEZE mechanisms share one machinery (a frozen ray stops at an
    # occupied probe and re-emits it next round, so the whole-frame
    # emission stream is unchanged — only the round partitioning, i.e.
    # composite reassociation, differs):
    #   cap_emit > 0: per-ray budget — freeze at the cap_emit-th occupied
    #     probe of the round (the device path's emit>=S freeze and the
    #     reference's num_step budget, nerf_render.cu:300).
    #   bucket (int): per-CHUNK budget — freeze once the round's global
    #     emission rank (compaction order: probe-major, then ray) reaches
    #     the merged program's static eval bucket. Overflow of the fused
    #     eval is thereby IMPOSSIBLE: n_valid <= bucket by construction,
    #     so the merged round never needs a replay path and tight buckets
    #     are safe. Rank = emitted-so-far (scalar base) + within-probe
    #     cumsum, which matches the compaction cumsum's flat [P, m] order
    #     exactly.
    cap = int(s.cap_emit) if s.cap_emit else P
    if want_slots:
        assert 0 < cap < P, "slot compaction requires 0 < cap_emit < P"
    freezing = cap < P or bucket is not None
    limit = None if bucket is None else jnp.int32(bucket)
    base = jnp.int32(0)
    valid_l, rds_l, rank_l = [], [], []
    last_t = t
    emit_rnd = jnp.zeros_like(n_emit)
    frozen = jnp.zeros_like(alive)
    # Bucket-spill simulator: a parallel replay of this same emission
    # pass WITHOUT the bucket limit (cap_emit still applies). Its excess
    # emission count is the EXACT number of samples the bucket deferred
    # to the next round — the host's demand signal. The old signal
    # (frozen-ray count) was only a floor: a frozen ray can carry up to
    # cap deferred samples, so plans sized to k+frozen stayed slightly
    # short and re-froze every frame (r4 steady state: 1695 frozen-ray
    # rounds/frame). Pure VPU state, ~6 extra [m] ops per probe, only
    # materialized when a bucket is active.
    spill_sim = limit is not None
    if spill_sim:
        nb_frozen = jnp.zeros_like(alive)
        nb_shadow = shadow
        nb_n_emit = n_emit
        nb_emit_rnd = jnp.zeros_like(n_emit)
    # bucket-boundary freezes only (excludes cap_emit freezes): the
    # host's bucket-escalation signal. cap_emit freezes fire at EVERY
    # surface round by design and say nothing about bucket shortage —
    # conflating them drove every surface round to the largest ladder
    # rung (~3x the needed eval, BENCH r3 regression).
    frozen_b = jnp.zeros_like(alive)
    t_freeze = t
    for k in range(P):
        tk, dt_k, tt = ts[k], dts_l[k], tt_l[k]
        if want_slots:
            rank_l.append(emit_rnd)  # per-ray emissions BEFORE probe k
        unshadowed = tk >= shadow
        can = (alive & (tk < far) & (n_emit < max_steps) & unshadowed
               & ~frozen)
        occ = occ_all[k]
        if cap < P:
            cap_hit = emit_rnd >= cap
            emit_k = can & occ & ~cap_hit
            freeze_k = can & occ & cap_hit
        else:
            emit_k = can & occ
            freeze_k = None
        if limit is not None:
            c = jnp.cumsum(emit_k.astype(jnp.int32))
            over = emit_k & (base + c - 1 >= limit)
            emit_k = emit_k & ~over
            freeze_k = over if freeze_k is None else freeze_k | over
            frozen_b = frozen_b | over
            base = jnp.minimum(base + c[-1], limit)
        if freezing:
            frozen = frozen | freeze_k
            t_freeze = jnp.where(freeze_k, tk, t_freeze)
        start_skip = can & ~occ
        shadow = jnp.where(start_skip, tt, shadow)
        t_emit = tk + dt_k
        rds_l.append(t_emit - last_t)
        last_t = jnp.where(emit_k, t_emit, last_t)
        n_emit = n_emit + emit_k.astype(jnp.int32)
        if cap < P:
            emit_rnd = emit_rnd + emit_k.astype(jnp.int32)
        valid_l.append(emit_k)
        if spill_sim:
            nb_can = (alive & (tk < far) & (nb_n_emit < max_steps)
                      & (tk >= nb_shadow) & ~nb_frozen)
            if cap < P:
                nb_hit = nb_emit_rnd >= cap
                nb_emit = nb_can & occ & ~nb_hit
                nb_frozen = nb_frozen | (nb_can & occ & nb_hit)
            else:
                nb_emit = nb_can & occ
            nb_shadow = jnp.where(nb_can & ~occ, tt, nb_shadow)
            nb_n_emit = nb_n_emit + nb_emit.astype(jnp.int32)
            nb_emit_rnd = nb_emit_rnd + nb_emit.astype(jnp.int32)
    if freezing:
        t_new = jnp.where(frozen, t_freeze, t_new)
    if spill_sim:
        spill = jnp.sum(nb_emit_rnd) - jnp.sum(
            jnp.stack([v.astype(jnp.int32) for v in valid_l]))
    else:
        spill = jnp.int32(0)

    if want_slots:
        # Per-ray slot compaction: with cap_emit < P every emitted sample
        # has a round-rank r < cap, so the round's samples fit a dense
        # [cap, m] slot grid — built with cap*P vectorized selects (pure
        # VPU) instead of the [P*m]-update compaction scatter (~17ms of
        # descriptor-bound HBM traffic at ns=2.1M, BASELINE.md r3).
        # t_slot carries the probe's fold time; eval recomputes the
        # position from it (same clip(o+t*d) expression, bit-identical),
        # so the [3, P*m] pos01/dir01 materializations disappear too.
        t_slot_l, probe_slot_l = [], []
        for s_ in range(cap):
            t_s = jnp.zeros((m,), jnp.float32)
            p_s = jnp.full((m,), -1, jnp.int32)
            for k in range(P):
                match = valid_l[k] & (rank_l[k] == s_)
                t_s = jnp.where(match, ts[k], t_s)
                p_s = jnp.where(match, jnp.int32(k), p_s)
            t_slot_l.append(t_s)
            probe_slot_l.append(p_s)
        t_slot = jnp.stack(t_slot_l)          # [cap, m]
        probe_slot = jnp.stack(probe_slot_l)  # [cap, m], -1 = empty
    else:
        t_slot = probe_slot = None

    xs = jnp.stack(xs_l, axis=1)      # [3, P, m]
    dts = jnp.stack(dts_l, axis=0)    # [P, m]
    rds = jnp.stack(rds_l, axis=0)
    valid = jnp.stack(valid_l, axis=0)

    # ---- pass 4: lattice-exact empty-space extension + ball chain -----
    # Continue the exact fold recurrence for gather-free steps, each
    # adopted only while its cell provably sits inside a free ball (see
    # docstring). Ball 0 is centered on the LAST gathered probe (its df
    # is already in hand); each CHAINED ball then re-gathers the skip
    # field at the advanced position — ONE [m] descriptor per ball vs
    # P*[m] for a probe pass — and walks its ball. For every live
    # non-frozen ray t_new is the ray's next unvisited lattice point, so
    # each ball starts the fold there per ray; a ray adopting no step
    # simply stays (its t_new never moves).
    #
    # cascade > 1 (VERDICT r3 item 5): the field stores one chebyshev
    # slab PER MIP and a ball proves emptiness only within its own mip's
    # grid, so adoption additionally requires the step's OWN mip
    # (mip_from_pos, the same level the no-skip march would probe) to
    # equal the ball's mip; a ray crossing a mip boundary stops
    # extending and the next probe pass takes over — conservative, so
    # the emission set stays exactly that of the no-skip march.
    if (skip_field is not None
            and (s.extend_steps > 0 or s.chain_balls > 0)):

        def ball_pass(t_cur, sh, ok, cell_c, radius, steps, mip_bound_c,
                      level_c):
            """Walk up to `steps` fold points from each ray's t_cur,
            adopting while |cell - cell_c|_inf <= radius in the ball's
            mip (all such cells are empty by construction of the field);
            the skip-shadow recurrence (render_utils.h:641-651 semantics,
            with the H-1 overshoot quirk) is replayed arithmetically over
            adopted points. Returns (t_cur', sh')."""
            adopted = ok
            tk2 = t_cur
            t_out = t_cur
            for _ in range(steps):
                x = jnp.clip(rays_o + tk2[None, :] * rays_d, -bound,
                             bound)
                cell = jnp.clip(0.5 * (x / mip_bound_c[None, :] + 1.0) * h,
                                0.0, float(h - 1)).astype(jnp.int32)
                inside = jnp.max(jnp.abs(cell - cell_c), axis=0) <= radius
                if level_c is not None:
                    inside = inside & (_mip_level(x, s.cascade) == level_c)
                adopted = adopted & inside & (tk2 < far)
                dt_k = jnp.clip(tk2 * dt_gamma, dt_min, dt_max)
                bnd = ((cell.astype(jnp.float32) + 0.5 + 0.5 * sgn)
                       / float(h - 1) * 2.0 - 1.0) * mip_bound_c[None, :]
                t_axes = (bnd - x) * rd_inv
                tt = tk2 + jnp.maximum(0.0, jnp.min(t_axes, axis=0))
                sh = jnp.where(adopted & (tk2 >= sh), tt, sh)
                tk2 = tk2 + dt_k
                t_out = jnp.where(adopted, tk2, t_out)
            return t_out, sh

        def mip_of(level):
            if level is None:
                return jnp.broadcast_to(bound, (m,)), None
            mb = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), bound)
            return mb, level

        live_ext = alive & ~frozen
        if s.extend_steps > 0:
            last = P - 1
            # cell of the last gathered probe (recompute from its
            # position in ITS mip)
            x_last = xs_l[last]
            mb_last, lv_last = mip_of(lvl_l[last])
            cell_last = jnp.clip(0.5 * (x_last / mb_last[None, :] + 1.0)
                                 * h, 0.0, float(h - 1)).astype(jnp.int32)
            ok0 = live_ext & (df_all[last] >= 2)
            t_new, shadow = ball_pass(t_new, shadow, ok0, cell_last,
                                      df_all[last] - 1, s.extend_steps,
                                      mb_last, lv_last)
        for _b in range(s.chain_balls):
            xc = jnp.clip(rays_o + t_new[None, :] * rays_d, -bound, bound)
            if s.cascade > 1:
                lvc = _mip_level(xc, s.cascade)
                mbc = jnp.minimum(jnp.exp2(lvc.astype(jnp.float32)),
                                  bound)
            else:
                lvc = None
                mbc = jnp.broadcast_to(bound, (m,))
            cellc = jnp.clip(0.5 * (xc / mbc[None, :] + 1.0) * h,
                             0.0, float(h - 1)).astype(jnp.int32)
            idxc = cellc[0] * (h * h) + cellc[1] * h + cellc[2]
            if lvc is not None:
                idxc = idxc + lvc * (h * h * h)
            dfc = _skip_lookup(skip_field, idxc)
            # df >= 1 suffices here: the ball is centered on the ray's
            # OWN next cell, so radius 0 still adopts same-cell points.
            # A frozen ray (parked at an occupied probe) or one whose
            # next cell is occupied (df == 0) adopts nothing and waits
            # for the next probe pass to emit it.
            okc = live_ext & (dfc >= 1) & (t_new < far)
            t_new, shadow = ball_pass(t_new, shadow, okc, cellc,
                                      dfc - 1, s.chain_steps, mbc, lvc)

    if want_slots:
        return (t_new, xs, dts, rds, valid, n_emit, shadow, frozen_b,
                spill, t_slot, probe_slot)
    return t_new, xs, dts, rds, valid, n_emit, shadow, frozen_b, spill


def _march_compact_core(density_grid, skip_field, rays_o_cf, rays_d_cf,
                        fars, t, alive, n_emit, shadow, round_idx,
                        perturb_seed, s: RenderSettings, bucket=None):
    """Deep march + sample compaction (probe-major). Returns (t_new,
    valid [P,m], pos01 [3,P*m], dir01 [3,P*m], comp [P*m] compaction
    indices, n_valid, dts, rds, n_emit_new, shadow_new, n_frozen,
    n_spill)."""
    m = t.shape[0]
    P = s.probes_per_round
    ns = P * m
    bound = jnp.float32(s.bound)

    (t_new, xs, dts, rds, valid, n_emit_new, shadow_new,
     frozen, spill) = _march_round_deep(
        t, alive, rays_o_cf, rays_d_cf, fars, density_grid, s, n_emit,
        shadow, round_idx=round_idx, perturb_seed=perturb_seed,
        skip_field=skip_field, bucket=bucket)

    # channel-first sample arrays [3, ns] — batch minor-most so HBM
    # tiles perfectly. (A sample-major [ns, 8] row layout measured ~30ms
    # per round: minor-dim-8 arrays pad to 128 lanes in HBM, a 16x write
    # amplification. Keeping SoA costs a few extra gathers at eval time
    # for SMALL buckets and none at all for large ones.)
    pos01 = (xs / (2.0 * bound) + 0.5).reshape(3, ns)
    dir01 = jnp.broadcast_to(rays_d_cf[:, None, :] * 0.5 + 0.5,
                             (3, P, m)).reshape(3, ns)

    vflat = valid.reshape(ns)
    dest = jnp.cumsum(vflat.astype(jnp.int32)) - 1
    n_valid = jnp.maximum(dest[-1] + 1, 0)
    src = jnp.arange(ns, dtype=jnp.int32)
    # comp[j] = flat lane of the j-th valid sample; padding = ns so the
    # composite's row-scatter drops it (mode="drop")
    comp = jnp.full((ns,), ns, jnp.int32).at[
        jnp.where(vflat, dest, ns)].set(src, mode="drop")
    n_frozen = jnp.sum(frozen.astype(jnp.int32))
    return (t_new, valid, pos01, dir01, comp, n_valid, dts, rds,
            n_emit_new, shadow_new, n_frozen, spill)


def _march_compact_slots(density_grid, skip_field, rays_o_cf, rays_d_cf,
                         fars, t, alive, n_emit, shadow, round_idx,
                         perturb_seed, s: RenderSettings, bucket):
    """Slot-mode march + compaction (requires 0 < cap_emit < P).

    The round's samples live on a dense [cap, m] slot grid (see
    _march_round_deep want_slots); the bucket compaction cumsum+scatter
    runs over cap*m lanes instead of P*m — 4x fewer scatter updates at
    the flagship settings — and no [3, P*m] position arrays are
    materialized (XLA DCEs the unused xs stack). Returns (t_new,
    valid [P,m], t_slot [cap,m], probe_slot [cap,m], comp [cap*m],
    n_valid, dts, rds, n_emit_new, shadow_new, n_frozen, n_spill)."""
    m = t.shape[0]
    cap = int(s.cap_emit)
    nslot = cap * m

    (t_new, _xs, dts, rds, valid, n_emit_new, shadow_new, frozen,
     spill, t_slot, probe_slot) = _march_round_deep(
        t, alive, rays_o_cf, rays_d_cf, fars, density_grid, s, n_emit,
        shadow, round_idx=round_idx, perturb_seed=perturb_seed,
        skip_field=skip_field, bucket=bucket, want_slots=True)

    vflat = (probe_slot >= 0).reshape(nslot)
    dest = jnp.cumsum(vflat.astype(jnp.int32)) - 1
    n_valid = jnp.maximum(dest[-1] + 1, 0)
    src = jnp.arange(nslot, dtype=jnp.int32)
    comp = jnp.full((nslot,), nslot, jnp.int32).at[
        jnp.where(vflat, dest, nslot)].set(src, mode="drop")
    n_frozen = jnp.sum(frozen.astype(jnp.int32))
    return (t_new, valid, t_slot, probe_slot, comp, n_valid, dts, rds,
            n_emit_new, shadow_new, n_frozen, spill)


def _composite_round_masked(smp_rgb, smp_sigma, smp_dt, smp_rd, valid,
                            t_round_start, weight_sum, depth, rgb_acc):
    """_composite_round with an explicit validity mask [P, N] instead of
    slot<emit counts (probe-major layout: invalid slots interleave)."""
    return _composite_parallel(smp_rgb, smp_sigma, smp_dt, smp_rd, valid,
                               t_round_start, weight_sum, depth, rgb_acc)


def _eval_slot_core(apply_fn: Callable, params, t_slot, probe_slot,
                    rays_o_cf, rays_d_cf, comp, size: int,
                    s: RenderSettings):
    """Slot-mode eval: gather the compacted prefix's fold times + ray
    ids, recompute positions with the march's exact clip(o+t*d)
    expression (bit-identical — no [3, ns] materialization to gather
    from). Returns (rgb [3, size], sigma [size], dest [size]) where dest
    is the [P*m]-flat composite destination (sentinel ns for padding)."""
    cap, m = t_slot.shape
    nslot = cap * m
    ns = s.probes_per_round * m
    bound = jnp.float32(s.bound)
    craw = comp[:size]
    c = jnp.minimum(craw, nslot - 1)
    ray = c % m
    t_c = t_slot.reshape(nslot)[c]
    o_c = rays_o_cf[:, ray]
    d_c = rays_d_cf[:, ray]
    x = jnp.clip(o_c + t_c[None, :] * d_c, -bound, bound)
    pos01 = x / (2.0 * bound) + 0.5
    dir01 = d_c * 0.5 + 0.5
    probe_c = probe_slot.reshape(nslot)[c]
    dest = jnp.where(craw == nslot, ns, probe_c * m + ray)
    rgb_k, sigma_k = apply_fn(params, pos01, dir01)
    return rgb_k, sigma_k, dest


def _composite_scatter_core(rgb_k, sigma_k, comp, valid, dts, rds, t, alive,
                            orig, n_emit, w_sum_full, depth_full, rgb_full,
                            fars, t_new, s: RenderSettings,
                            all_lanes: bool = False, dest=None):
    """Probe-major compositing of eval results into full-chunk
    accumulators.

    rgb_k [3, size] / sigma_k [size] are the eval outputs. With
    all_lanes=True they are LANE-ordered [.., P*m] and map to slots
    directly; otherwise they are COMPACTED-ordered and get scattered back
    through comp[:size] channel-wise (padding entries = ns, mode=drop) —
    size descriptors per channel, all arrays perfectly tiled. The flag is
    explicit because a gather bucket can coincidentally equal P*m.
    """
    m = t.shape[0]
    P = dts.shape[0]
    ns = P * m
    size = sigma_k.shape[0]

    if s.density_scale != 1.0:
        sigma_k = sigma_k * jnp.float32(s.density_scale)
    if all_lanes:
        sigma = sigma_k.reshape(P, m)
        rgb_s = rgb_k.reshape(3, P, m)
    else:
        c = comp[:size] if dest is None else dest
        sigma = jnp.zeros((ns,), jnp.float32).at[c].set(
            sigma_k, mode="drop").reshape(P, m)
        rgb_s = jnp.stack([
            jnp.zeros((ns,), jnp.float32).at[c].set(rgb_k[ch], mode="drop")
            for ch in range(3)]).reshape(3, P, m)

    ws0 = w_sum_full[orig]
    w_new, d_delta, rgb_delta, term = _composite_round_masked(
        rgb_s, sigma, dts, rds, valid, t, ws0,
        jnp.zeros((m,), jnp.float32), jnp.zeros((3, m), jnp.float32))
    live = alive.astype(jnp.float32)
    w_sum_full = w_sum_full.at[orig].add((w_new - ws0) * live)
    depth_full = depth_full.at[orig].add(d_delta * live)
    rgb_full = rgb_full.at[:, orig].add(rgb_delta * live[None, :])
    alive_new = (alive & ~term & (t_new < fars)
                 & (n_emit < jnp.int32(s.max_infer_steps)))
    return (w_sum_full, depth_full, rgb_full, alive_new,
            jnp.sum(alive_new.astype(jnp.int32)))


# ---------------------------------------------------------------------------
# Host-driven round loop.
#
# Functionally identical to the on-device while_loop path below, but each
# march round is its own small jitted program and the loop + liveness check
# run on the host — the structure of the reference's render loop
# (nerf_render.cu:269-338, including its per-iteration alive-counter
# readback :288-292). Exists because this environment's remote TPU compiler
# reliably deoptimizes the large whole-frame program while compiling
# round-sized programs well (see BASELINE.md); the host sync costs ~ms per
# round, negligible against a 10^4x binary-quality gap.
# ---------------------------------------------------------------------------

def _eval_gather_core(apply_fn: Callable, params, pos01, dir01, comp,
                      size: int):
    """Small-bucket eval: per-channel gathers of the compacted sample
    prefix (6 x size descriptors from perfectly-tiled [3, ns] arrays),
    then the network. Returns (rgb [3, size], sigma [size])."""
    ns = pos01.shape[1]
    c = jnp.minimum(comp[:size], ns - 1)
    pos_c = pos01[:, c]
    dir_c = dir01[:, c]
    return apply_fn(params, pos_c, dir_c)


def _round_merged_core(apply_fn: Callable, params, density_grid, skip_field,
                       rays_o_cf, rays_d_cf, fars, t, alive, n_emit, shadow,
                       orig, w_sum, depth, rgb, round_idx, perturb_seed,
                       settings: RenderSettings, bucket):
    """March + network eval + composite as ONE jitted program per
    chunk-round — the fused form of the reference's hot loop
    (src/nerf_render.cu:269-338).

    Round 2 measured ~65% of an 800x800 frame as Python dispatch/readback
    (127 rounds x 3 jit calls + per-wave count reads, BENCH_r02); fusing
    the three phases cuts dispatch 3x and lets XLA fuse across the
    phase boundaries. The price: the eval batch size must be chosen
    STATICALLY before the march's valid-sample count is known, so the
    host picks `bucket` optimistically from the previous round's count:
      bucket=None -> evaluate ALL P*m lanes (can never run short),
      bucket=0    -> skip eval entirely (empty-space round),
      bucket=k    -> evaluate the compacted k-prefix.
    The bucket can NEVER overflow: the march freezes rays at the probe
    where the round's emission rank reaches the bucket (see
    _march_round_deep pass 3), and frozen rays resume at that exact
    probe next round — the same round-partition reassociation class as
    cap_emit. counts[2] reports how many rays froze (the escalation
    trigger) and counts[3] the exact number of deferred samples (the
    demand delta the plan adds back). With no replay path the program
    returns ONLY the carried ray state + accumulators, which lets XLA
    dead-code-eliminate the [P*m] compaction scatter in the bucket=0
    and all-lanes variants (~17ms/round of descriptor-bound scatter at
    ns=2.1M, BASELINE.md r3).

    Returns (t_new, n_emit_new, shadow_new, w_sum', depth', rgb',
    alive', counts[4]) with counts = [n_valid, n_alive', n_frozen,
    n_spill].

    The whole round is guarded by lax.cond(any(alive), ...): an all-dead
    round is an exact identity on every output (no lane can probe, emit
    or composite), so the dead branch returns the inputs unchanged and
    the march/eval work is skipped at runtime. This makes deep
    issue-ahead pipelines cheap — rounds issued past a chunk's death
    (the host only learns of death one stale count-read later) cost ~0
    device time instead of a full march (~16ms at m=65536, BASELINE r4).
    """
    def _dead(_):
        return (t, n_emit, shadow, w_sum, depth, rgb, alive,
                jnp.zeros((4,), jnp.int32))

    def _live(_):
        return _round_merged_live(
            apply_fn, params, density_grid, skip_field, rays_o_cf,
            rays_d_cf, fars, t, alive, n_emit, shadow, orig, w_sum, depth,
            rgb, round_idx, perturb_seed, settings, bucket)

    return jax.lax.cond(jnp.any(alive), _live, _dead, None)


def _round_merged_live(apply_fn: Callable, params, density_grid, skip_field,
                       rays_o_cf, rays_d_cf, fars, t, alive, n_emit, shadow,
                       orig, w_sum, depth, rgb, round_idx, perturb_seed,
                       settings: RenderSettings, bucket):
    s = settings
    m = t.shape[0]
    ns = s.probes_per_round * m
    slot_mode = (bucket is not None and bucket != 0
                 and 0 < s.cap_emit < s.probes_per_round)

    if slot_mode:
        # Slot-mode round: [cap, m] slot grid instead of a [P*m]
        # compaction scatter; eval recomputes positions from fold times
        # (see _march_compact_slots). Output-identical to the dense path.
        bucket = min(int(bucket), int(s.cap_emit) * m)
        (t_new, valid, t_slot, probe_slot, comp, n_valid, dts, rds,
         n_emit_new, shadow_new, n_frozen, spill) = _march_compact_slots(
            density_grid, skip_field, rays_o_cf, rays_d_cf, fars, t,
            alive, n_emit, shadow, round_idx, perturb_seed, s,
            bucket=bucket)
        rgb_k, sigma_k, dest = _eval_slot_core(
            apply_fn, params, t_slot, probe_slot, rays_o_cf, rays_d_cf,
            comp, bucket, s)
        w2, d2, rgb2, alive2, n_alive = _composite_scatter_core(
            rgb_k, sigma_k, comp, valid, dts, rds, t, alive, orig,
            n_emit_new, w_sum, depth, rgb, fars, t_new, s,
            all_lanes=False, dest=dest)
        counts = jnp.stack([n_valid, n_alive, n_frozen, spill])
        return (t_new, n_emit_new, shadow_new, w2, d2, rgb2, alive2,
                counts)

    (t_new, valid, pos01, dir01, comp, n_valid, dts, rds, n_emit_new,
     shadow_new, n_frozen, spill) = _march_compact_core(
        density_grid, skip_field, rays_o_cf, rays_d_cf, fars, t, alive,
        n_emit, shadow, round_idx, perturb_seed, s, bucket=bucket)

    if bucket is None or bucket > 0:
        if bucket is None:
            rgb_k, sigma_k = apply_fn(params, pos01, dir01)
            all_lanes = True
        else:
            rgb_k, sigma_k = _eval_gather_core(apply_fn, params, pos01,
                                               dir01, comp, bucket)
            all_lanes = False
        w2, d2, rgb2, alive2, n_alive = _composite_scatter_core(
            rgb_k, sigma_k, comp, valid, dts, rds, t, alive, orig,
            n_emit_new, w_sum, depth, rgb, fars, t_new, s,
            all_lanes=all_lanes)
    else:  # bucket == 0: pure traversal round, no network
        w2, d2, rgb2 = w_sum, depth, rgb
        alive2 = (alive & (t_new < fars)
                  & (n_emit_new < jnp.int32(s.max_infer_steps)))
        n_alive = jnp.sum(alive2.astype(jnp.int32))

    counts = jnp.stack([n_valid, n_alive, n_frozen, spill])
    return (t_new, n_emit_new, shadow_new, w2, d2, rgb2, alive2, counts)


@functools.partial(jax.jit, static_argnames=("apply_fn", "settings",
                                             "bucket"))
def _round_merged(apply_fn: Callable, params, density_grid, skip_field,
                  rays_o_cf, rays_d_cf, fars, t, alive, n_emit, shadow,
                  orig, w_sum, depth, rgb, round_idx, perturb_seed,
                  settings: RenderSettings, bucket):
    return _round_merged_core(apply_fn, params, density_grid, skip_field,
                              rays_o_cf, rays_d_cf, fars, t, alive, n_emit,
                              shadow, orig, w_sum, depth, rgb, round_idx,
                              perturb_seed, settings, bucket)


_ABS_BUCKETS = (1024, 4096, 16384, 65536, 262144, 1048576)


def _choose_bucket(k_est: int, ns: int, allowed):
    """Static eval size for the next merged round from the PREVIOUS
    round's valid-sample count (stale by one round — the price of the
    fused dispatch; excess demand freezes rays, never overflows). 2x
    headroom covers count growth at surface-crossing rounds; k_est < 0
    means the first rounds (no information yet) and guesses ns/8 —
    generous, because the depth-2 pipeline issues round 1 before round
    0's count arrives and an early freeze costs escalation rounds.

    The all-lanes escape (None) is never taken when ANY ladder rung fits
    below ns: freeze makes clamping to the largest bucket SAFE (excess
    demand spills into later rounds), and an all-lanes eval at ns=2.1M
    measured 432ms vs 105ms for the 131072 bucket
    (scripts/profile_round.py) — an escalation round is far cheaper than
    one all-lanes round. With bucket_set unset the built-in _ABS_BUCKETS
    ladder applies the same freeze-and-clamp policy (VERDICT r3 weak #7:
    the old no-ladder branch silently re-enabled the pathological
    all-lanes path for large demands)."""
    ladder = sorted(b for b in (allowed or _ABS_BUCKETS) if b < ns)
    if not ladder:
        # ns is below every rung — "all lanes" IS the smallest batch
        return None
    if k_est < 0:
        # no information yet (the first depth_pipe rounds): guess CHEAP.
        # Rays start at the AABB entry, so round 0 is almost always pure
        # traversal; freeze-and-escalate makes a wrong guess benign (one
        # ~12ms escalation round) while a large blind bucket costs ~76ms
        # per blind round (profile_round, bucket=524288 vs 0). k_est=-1
        # means round 0 (guess 0); k_est=-2 means round 1 (guess the
        # smallest rung — rays may reach surfaces on the second round).
        if k_est == -1:
            return 0
        return ladder[0]
    if k_est == 0:
        return 0
    headroom = 2 * k_est
    for sz in ladder:
        if sz >= headroom:
            return sz
    return ladder[-1]


@functools.partial(jax.jit, static_argnames=("m_out",))
def _compact_rays(alive, t, o_cf, d_cf, fars, orig, n_emit, shadow,
                  m_out: int):
    """Compact alive rays to an m_out-sized prefix (the reference's
    kernel_compact_rays, render_utils.h:394-415, with a static-shape
    cumsum permutation instead of atomicAdd slots).

    Caller guarantees n_alive <= m_out. Padding lanes are born dead
    (alive=False, far=0) and keep orig of lane 0 — their downstream
    contributions are masked to exact zeros.
    """
    m_in = alive.shape[0]
    dest = jnp.cumsum(alive.astype(jnp.int32)) - 1
    src = jnp.arange(m_in, dtype=jnp.int32)
    comp = jnp.full((m_out,), -1, jnp.int32).at[
        jnp.where(alive, dest, m_out)].set(src, mode="drop")
    alive_out = comp >= 0
    c = jnp.maximum(comp, 0)
    return (alive_out, t[c], o_cf[:, c], d_cf[:, c],
            jnp.where(alive_out, fars[c], 0.0), orig[c], n_emit[c],
            shadow[c])


def _ray_buckets(chunk: int, allowed=()):
    """Descending ray working-set sizes for cross-round compaction.

    Divide-by-4 ladder: march cost scales with the working set, so a
    coarser ladder leaves big dead-lane populations marching (a /8 ladder
    measured 65536 lanes marching for 27k alive rays, BASELINE.md)."""
    if allowed:
        return sorted({min(b, chunk) for b in allowed}, reverse=True)
    sizes = []
    m = chunk
    while m >= 4096:
        sizes.append(m)
        m //= 4
    if not sizes:
        sizes = [chunk]
    return sizes


@functools.partial(jax.jit, static_argnames=("settings",))
def _finalize_chunk(weight_sum, depth, nears, fars,
                    settings: RenderSettings):
    rgb_bias = (1.0 - weight_sum) * jnp.float32(settings.bg_color)
    span = fars - nears
    d = jnp.where(span > 0,
                  jnp.maximum(depth - nears, 0.0)
                  / jnp.where(span > 0, span, 1.0), 0.0)
    return rgb_bias, d


@jax.jit
def _concat_counts(parts):
    """Stack per-chunk [2]-count arrays for the single wave readback.
    Callers pad the tuple to a fixed length so one jit specialization
    serves every wave."""
    return jnp.concatenate(parts)


# ---------------------------------------------------------------------------
# Sharded host-driven round loop: the host loop above, with every per-round
# program shard_mapped over a ray mesh. Each device owns a contiguous ray
# block, compacts ITS OWN samples/rays (local cumsums — no cross-device
# collectives in the hot path, matching the reference's per-GPU
# independence, nerf_render.cu:252-362), and the host makes bucket
# decisions from the per-device counts (one gather of a [D,2] array per
# round). SPMD requires uniform static shapes, so buckets are sized to the
# max count across devices.
# ---------------------------------------------------------------------------


class _ShardedRounds:
    """Per-(mesh, settings, apply_fn) cache of shard_mapped round programs."""

    def __init__(self, mesh, settings: RenderSettings, apply_fn: Callable):
        from jax.sharding import PartitionSpec as P

        self.mesh = mesh
        self.s = settings
        self.apply_fn = apply_fn
        self.axis = mesh.axis_names[0]
        self.n_dev = mesh.devices.size
        self._pr = P(self.axis)          # [n] sharded
        self._pc = P(None, self.axis)    # [C, n] sharded on batch
        self._p0 = P()
        self._cache = {}

    def _smap(self, core, in_specs, out_specs):
        return jax.jit(jax.shard_map(
            core, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False))

    def merged(self, bucket, has_skip_field: bool):
        """shard_mapped merged round (march+eval+composite, one program);
        bucket is the PER-SHARD static eval size (None/0/int). Per-device
        counts [4] concatenate to a global [4*D] for the wave read."""
        key = ("merged", bucket, has_skip_field)
        if key not in self._cache:
            s = self.s
            apply_fn = self.apply_fn

            def core(p, dg, sf, o, d, fr, t, alive, ne, sh, orig,
                     w, dep, rgb, ri, sd):
                return _round_merged_core(
                    apply_fn, p, dg, sf, o, d, fr, t, alive, ne, sh,
                    orig, w, dep, rgb, ri, sd, s, bucket)

            self._cache[key] = self._smap(
                core,
                (self._p0, self._p0, self._p0, self._pc, self._pc,
                 self._pr, self._pr, self._pr, self._pr, self._pr,
                 self._pr, self._pr, self._pr, self._pc, self._p0,
                 self._p0),
                # t_new, n_emit, shadow, w, depth, rgb, alive, counts[4]
                (self._pr, self._pr, self._pr, self._pr, self._pr,
                 self._pc, self._pr, self._pr))
        return self._cache[key]

    def compact(self, m_out_local):
        key = ("compact", m_out_local)
        if key not in self._cache:
            def core(alive, t, o, d, fr, orig, ne, sh):
                return _compact_rays(alive, t, o, d, fr, orig, ne, sh,
                                     m_out_local)

            self._cache[key] = self._smap(
                core,
                (self._pr, self._pr, self._pc, self._pc, self._pr,
                 self._pr, self._pr, self._pr),
                (self._pr, self._pr, self._pc, self._pc, self._pr,
                 self._pr, self._pr, self._pr))
        return self._cache[key]

    def finalize(self):
        key = "finalize"
        if key not in self._cache:
            s = self.s

            def core(w, dep, nr, fr):
                return _finalize_chunk(w, dep, nr, fr, s)

            self._cache[key] = self._smap(
                core, (self._pr, self._pr, self._pr, self._pr),
                (self._pr, self._pr))
        return self._cache[key]



@functools.partial(jax.jit, static_argnames=("apply_fn", "settings"))
def render_rays(apply_fn: Callable, params, density_grid, rays_o, rays_d,
                nears, fars, settings: RenderSettings,
                perturb_seed=None) -> RenderResult:
    """Render a batch of rays to (rgb, depth, weight_sum).

    apply_fn(params, pos01_cf [3,B], dir01_cf [3,B]) -> (rgb [3,B],
    sigma [B]) — the NerfNetwork channel-first forward (oracle or fused
    Pallas variant). One fused jit, no host round-trips; memory bounded by
    `settings.ray_chunk` via lax.map over chunks.
    """
    s = settings
    n = rays_o.shape[0]
    chunk = min(s.ray_chunk, n)

    rays_o_cf = rays_o.T  # [3, N]
    rays_d_cf = rays_d.T

    if n <= chunk:
        rgb, depth, wsum, rounds = _render_chunk(
            apply_fn, params, density_grid, rays_o_cf, rays_d_cf, nears,
            fars, s, perturb_seed=perturb_seed)
        return RenderResult(rgb=rgb.T, depth=depth, weight_sum=wsum,
                            n_rounds=rounds)

    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk - n
    if n_pad:
        # padding rays are born dead: near == far == FLT_MAX
        rays_o_cf = jnp.pad(rays_o_cf, ((0, 0), (0, n_pad)))
        rays_d_cf = jnp.pad(rays_d_cf, ((0, 0), (0, n_pad)),
                            constant_values=1.0)
        nears = jnp.pad(nears, (0, n_pad), constant_values=_FLT_MAX)
        fars = jnp.pad(fars, (0, n_pad), constant_values=_FLT_MAX)

    def one(chunk_in):
        o, d, nr, fr, ci = chunk_in
        seed = None
        if perturb_seed is not None:
            seed = perturb_seed + ci * jnp.int32(1315423911)
        return _render_chunk(apply_fn, params, density_grid, o, d, nr, fr,
                             s, perturb_seed=seed)

    xs = (rays_o_cf.reshape(3, n_chunks, chunk).transpose(1, 0, 2),
          rays_d_cf.reshape(3, n_chunks, chunk).transpose(1, 0, 2),
          nears.reshape(n_chunks, chunk),
          fars.reshape(n_chunks, chunk),
          jnp.arange(n_chunks, dtype=jnp.int32))
    rgb, depth, wsum, rounds = jax.lax.map(one, xs)
    rgb = rgb.transpose(1, 0, 2).reshape(3, n_chunks * chunk)[:, :n]
    depth = depth.reshape(-1)[:n]
    wsum = wsum.reshape(-1)[:n]
    return RenderResult(rgb=rgb.T, depth=depth, weight_sum=wsum,
                        n_rounds=jnp.max(rounds))


# Host-driven wave schedulers (single-device + sharded) live in
# nerf_tpu/render/hostloop.py; re-exported here for the public API and
# existing call sites/tests.
from nerf_tpu.render.hostloop import (  # noqa: E402
    render_rays_hostloop,
    render_rays_hostloop_sharded,
)
