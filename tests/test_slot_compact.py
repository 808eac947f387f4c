"""Slot-mode compaction unit equivalence (march.py _march_compact_slots).

The slot path replaces the [P*m]-update compaction scatter with a dense
[cap_emit, m] slot grid and recomputes eval positions from gathered fold
times. These tests pin the function-level contract against the dense
path: identical sample SET (probe, ray, t), identical count, and
bit-identical recomputed positions — so the end-to-end equality tests
(test_render.py::test_cap_emit_matches_device_loop) can only break via
wiring, not via the slot math.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from nerf_tpu.core.snapshot import make_synthetic_snapshot
from nerf_tpu.core.types import Camera, RenderSettings
from nerf_tpu.render.march import (
    _march_compact_core,
    _march_compact_slots,
)
from nerf_tpu.render.rays import generate_rays, near_far_from_aabb

from test_render import SMALL_CFG  # noqa: F401  (fixture import style)


def _inputs(cap_emit, probes, bucket):
    snap = make_synthetic_snapshot(seed=3, grid_h=32,
                                   network_config=SMALL_CFG)
    s = RenderSettings(
        bound=snap.settings.bound, cascade=snap.settings.cascade,
        grid_h=snap.settings.grid_h,
        mean_density=snap.settings.mean_density,
        aabb=snap.settings.aabb, density_scale=8.0,
        probes_per_round=probes, cap_emit=cap_emit)
    grid = jnp.asarray(snap.density_grid)
    rot = np.eye(3, dtype=np.float32)
    origin = np.array([0.1, 0.2, -2.0], np.float32)
    cam = Camera(fl_x=16.0, fl_y=16.0, cx=8.0, cy=8.0)
    rays_o, rays_d = generate_rays(cam, rot, origin, 16, 16)
    nears, fars = near_far_from_aabb(
        rays_o, rays_d, jnp.asarray(s.aabb, jnp.float32), s.min_near)
    m = rays_o.shape[0]
    o_cf = jnp.asarray(np.asarray(rays_o).T)
    d_cf = jnp.asarray(np.asarray(rays_d).T)
    t0 = jnp.asarray(nears)
    alive = jnp.asarray(np.asarray(nears) < np.asarray(fars))
    ne = jnp.zeros((m,), jnp.int32)
    sh = jnp.zeros((m,), jnp.float32)
    return grid, o_cf, d_cf, jnp.asarray(fars), t0, alive, ne, sh, s


def test_slot_compact_matches_dense():
    cap, P, bucket = 4, 8, 64
    (grid, o_cf, d_cf, fars, t0, alive, ne, sh, s) = _inputs(cap, P, bucket)
    m = t0.shape[0]

    # advance to the first round that emits samples (rays start in empty
    # space at round 0)
    for rnd in range(12):
        (t_d, valid_d, pos01, dir01, comp_d, nv_d, dts_d, rds_d, ne_d,
         sh_d, nf_d, sp_d) = _march_compact_core(
            grid, None, o_cf, d_cf, fars, t0, alive, ne, sh,
            jnp.int32(rnd), None, s, bucket=bucket)
        if int(nv_d) > 0:
            break
        t0, ne, sh = t_d, ne_d, sh_d
    (t_s, valid_s, t_slot, probe_slot, comp_s, nv_s, dts_s, rds_s, ne_s,
     sh_s, nf_s, sp_s) = _march_compact_slots(grid, None, o_cf, d_cf, fars, t0,
                                        alive, ne, sh, jnp.int32(rnd),
                                        None, s, bucket=bucket)

    # carried ray state identical
    np.testing.assert_array_equal(np.asarray(t_d), np.asarray(t_s))
    np.testing.assert_array_equal(np.asarray(valid_d), np.asarray(valid_s))
    np.testing.assert_array_equal(np.asarray(ne_d), np.asarray(ne_s))
    np.testing.assert_array_equal(np.asarray(sh_d), np.asarray(sh_s))
    assert int(nv_d) == int(nv_s)
    assert int(nf_d) == int(nf_s)
    assert int(sp_d) == int(sp_s)
    nv = int(nv_d)
    assert nv > 0, "scene must emit samples for the test to mean anything"

    # dense comp entries are flat [P, m] lanes; slot comp entries are flat
    # [cap, m] slots — map both to (probe, ray) sets and compare
    cd = np.asarray(comp_d)[:nv]
    dense_set = {(int(c) // m, int(c) % m) for c in cd}
    cs = np.asarray(comp_s)[:nv]
    ps_np = np.asarray(probe_slot).reshape(-1)
    slot_set = {(int(ps_np[c]), int(c) % m) for c in cs}
    assert dense_set == slot_set

    # recomputed positions must be bit-identical to the dense pos01:
    # dense pos01 is indexed by flat lane probe*m+ray
    bound = np.float32(s.bound)
    tflat = np.asarray(t_slot).reshape(-1)
    o_np, d_np = np.asarray(o_cf), np.asarray(d_cf)
    pos_np = np.asarray(pos01)
    for c in cs[: min(nv, 64)]:
        ray = int(c) % m
        probe = int(ps_np[c])
        x = np.clip(o_np[:, ray] + tflat[c] * d_np[:, ray], -bound, bound)
        p = x / (2.0 * bound) + 0.5
        np.testing.assert_array_equal(p.astype(np.float32),
                                      pos_np[:, probe * m + ray])


def test_slot_compact_respects_bucket_freeze():
    """With a tiny bucket both paths freeze identically and the slot comp
    never exceeds the bucket."""
    cap, P, bucket = 4, 8, 16
    (grid, o_cf, d_cf, fars, t0, alive, ne, sh, s) = _inputs(cap, P, bucket)

    nf_total = 0
    for rnd in range(12):
        (t0, _v, _ts, probe_slot, comp_s, nv_s, _dt, _rd, ne, sh,
         nf_s, sp_s) = _march_compact_slots(grid, None, o_cf, d_cf, fars, t0,
                                      alive, ne, sh, jnp.int32(rnd), None,
                                      s, bucket=bucket)
        assert int(nv_s) <= bucket
        nf_total += int(nf_s)
    assert nf_total > 0, "tiny bucket must freeze rays"


def test_spill_counts_exact_deferred_demand():
    """counts[3] (spill) is EXACTLY the number of samples the bucket
    deferred: with no bucket the round emits nv_free samples (cap_emit
    still applies); with bucket B < nv_free it emits B and must report
    spill == nv_free - B, so the host's k+spill demand signal is exact
    (the old frozen-ray count was only a floor)."""
    cap, P = 4, 8
    (grid, o_cf, d_cf, fars, t0, alive, ne, sh, s) = _inputs(cap, P, 64)
    # advance to the first emitting round
    for rnd in range(12):
        out_free = _march_compact_core(grid, None, o_cf, d_cf, fars, t0,
                                       alive, ne, sh, jnp.int32(rnd),
                                       None, s, bucket=None)
        if int(out_free[5]) > 0:
            break
        t0, ne, sh = out_free[0], out_free[8], out_free[9]
    nv_free = int(out_free[5])
    assert int(out_free[11]) == 0  # no bucket -> no spill
    assert nv_free > 4, "need excess demand for the test to bite"
    out_b = _march_compact_core(grid, None, o_cf, d_cf, fars, t0, alive,
                                ne, sh, jnp.int32(rnd), None, s, bucket=4)
    nv_b, spill_b = int(out_b[5]), int(out_b[11])
    assert nv_b == 4
    assert spill_b == nv_free - nv_b
