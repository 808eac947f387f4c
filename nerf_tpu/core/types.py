"""Core value types.

Reference parity: `Camera`/`Image` structs in
/root/reference/include/nerf-cuda/common.h:68-89, plus the scene constants
held as `NerfRender` privates (nerf_render.h:53-78). Rebuilt as frozen
dataclasses; `RenderSettings` is hashable so it can be a `jit` static arg.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole intrinsics (ref common.h:68-74)."""

    fl_x: float
    fl_y: float
    cx: float
    cy: float


@dataclasses.dataclass
class Image:
    """Rendered frame: uint8 RGB [H, W, 3] + uint8 depth [H, W] (ref common.h:76-89)."""

    w: int
    h: int
    rgb: np.ndarray
    depth: np.ndarray


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static scene/render constants.

    Defaults mirror the reference `NerfRender` member defaults
    (nerf_render.h:53-78): bound=1, scale=0.33, cascade=1, grid H=128,
    mean_density=1e-4, dt_gamma=1/128, bg_color=1, min_near=0.2,
    max march steps 1024.

    TPU-specific knobs (no reference analog; replace the dynamic
    ray-compaction loop of nerf_render.cu:269-338 with static shapes):
      samples_per_round: max samples emitted per ray per round (ref
        num_step is dynamic in [1,8]; we fix it at trace time).
      probes_per_round: occupancy probes per ray per round; bounds the
        march outer loop (ref loops until n_step emissions).
      skip_iters: bounded re-run of the reference's voxel-skip do-while
        (render_utils.h:648-651).
    """

    bound: float = 1.0
    scale: float = 0.33
    cascade: int = 1
    grid_h: int = 128
    mean_density: float = 1e-4
    dt_gamma: float = 1.0 / 128.0
    bg_color: float = 1.0
    min_near: float = 0.2
    density_scale: float = 1.0
    max_infer_steps: int = 1024
    perturb: int = 0
    # TPU marcher shape knobs
    samples_per_round: int = 8
    probes_per_round: int = 16
    skip_iters: int = 512  # safety cap on the voxel-skip while_loop
    # rays per lax.map chunk — bounds HBM (analog of the reference's
    # per-GPU buffer sizing, nerf_render.cu:186-236)
    ray_chunk: int = 65536
    # Bounds on host-loop jit specializations (cold-compile budget
    # control): allowed adaptive num_step values (the reference's
    # clamp(N/num_alive,1,8), nerf_render.cu:300, restricted to this set)
    # and allowed static network bucket sizes. Empty = built-in defaults.
    s_round_set: Tuple[int, ...] = (1, 2, 4, 8)
    bucket_set: Tuple[int, ...] = ()
    # allowed ray working-set sizes for cross-round ray compaction
    # (empty = powers-of-8 ladder down from ray_chunk, floor 4096)
    ray_bucket_set: Tuple[int, ...] = ()
    # drive the round loop from the host (wave-scheduled round programs
    # with sample/ray compaction, like nerf_render.cu:269-338) instead of
    # one whole-frame device program. The host loop is the measured fast
    # path (BASELINE.md) and the default; the on-device while_loop path
    # remains for fully-jitted use cases (and as the equality oracle).
    host_loop: bool = True
    # host-loop march: derive a chebyshev distance-to-occupied field from
    # the density grid (render/density_grid.py:build_skip_field) enabling
    # long-range empty-space jumps (the TPU answer to the reference's
    # bitfield march, render_utils.h:417-522; see march.py). skip_cap
    # bounds the stored distance (jump <= skip_cap-1 cells per round).
    use_skip_field: bool = True
    skip_cap: int = 32
    # skip-field gather row width (cells packed along z per gather row).
    # XLA gathers are descriptor-bound and width-2/4 rows run ~1.56x the
    # width-1 descriptor rate on v5e (195/196M vs 125M rows/s,
    # bench_gather.py) — the march's occupancy gather fetches a w-cell
    # row and lane-selects its cell. 1 = unpacked.
    skip_row_w: int = 1
    # gather-free trajectory extension steps per round (lattice-exact
    # empty-space skipping, see march.py pass 4); 0 disables
    extend_steps: int = 32
    # chained free-ball extensions per round (march.py pass 4): after the
    # batched probe pass + extension, re-gather the skip field at the
    # advanced position (ONE [m] descriptor per ball vs P*[m] for a probe
    # pass) and walk up to chain_steps more gather-free lattice points in
    # its free ball. Cuts occupancy-probe descriptors per traversed
    # distance ~2x at the flagship settings (BASELINE r4). 0 disables.
    chain_balls: int = 0
    chain_steps: int = 8
    # deep-march per-round emission cap (the analog of the reference's
    # num_step<=8 march budget, nerf_render.cu:300): rays freeze at their
    # cap_emit-th occupied probe so samples past the compositor's
    # T<1e-4 cut are never evaluated — on sharp scenes an uncapped
    # 32-probe round evaluates ~6x more samples than contribute.
    # 0 disables (emit up to probes_per_round).
    cap_emit: int = 0
    aabb: Tuple[float, float, float, float, float, float] = (
        -1.0, -1.0, -1.0, 1.0, 1.0, 1.0,
    )

    @property
    def max_rounds(self) -> int:
        """Device-path round cap. Each round a live ray either consumes
        >= samples_per_round of its max_infer_steps emission budget or
        >= probes_per_round trajectory steps (every probe advances t by
        >= MIN_STEPSIZE, render_utils.h:579), and the trajectory is at
        most the aabb diagonal long — so the sum of the two bounds is a
        true worst case (ADVICE r2: the old emission-only cap silently
        truncated rays in bound>2 scenes with long empty stretches)."""
        import math

        emit_rounds = -(-self.max_infer_steps // self.samples_per_round)
        span = math.dist(self.aabb[:3], self.aabb[3:])
        probe_rounds = int(math.ceil(
            span / MIN_STEPSIZE / max(1, self.probes_per_round)))
        return emit_rounds + probe_rounds


# Constants mirroring render_utils.h:178-190.
DENSITY_THRESH = 0.01
SQRT3 = 1.7320508075688772
MAX_STEPS = 1024
MIN_STEPSIZE = 2.0 * SQRT3 / MAX_STEPS
MIN_NEAR = 0.05
DT_GAMMA = 1.0 / 128.0
