import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.core.snapshot import make_synthetic_snapshot
from nerf_tpu.core.types import Camera, RenderSettings
from nerf_tpu.models.nerf import build_nerf_network
from nerf_tpu.render.engine import NerfRender
from nerf_tpu.render.march import render_rays
from nerf_tpu.render.rays import (
    generate_rays,
    near_far_from_aabb,
    nerf_matrix_to_ngp,
)
from tests.reference_sim import render_rays_reference

SMALL_CFG = {
    "encoding": {"otype": "HashGrid", "n_levels": 8,
                 "n_features_per_level": 2, "log2_hashmap_size": 15,
                 "base_resolution": 16},
    "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                "output_activation": "None", "n_neurons": 64,
                "n_hidden_layers": 1},
    "dir_encoding": {"otype": "SphericalHarmonics", "degree": 4},
    "rgb_network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": 64,
                    "n_hidden_layers": 2},
}

CAM = Camera(fl_x=30.0, fl_y=30.0, cx=12.0, cy=12.0)

# Identity-rotation nerf pose at z=+6: after nerf_matrix_to_ngp the camera
# sits at ngp (0, 1.98, 0) looking along -y, through the origin sphere.
NERF_POSE = np.array([
    [1.0, 0.0, 0.0, 0.0],
    [0.0, 1.0, 0.0, 0.0],
    [0.0, 0.0, 1.0, 6.0],
    [0.0, 0.0, 0.0, 1.0],
], np.float32)


def test_nerf_matrix_to_ngp():
    """Exact permutation/negation per render_utils.h:68-77."""
    p = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = nerf_matrix_to_ngp(p, scale=0.5, offset=(1.0, 2.0, 3.0))
    expected = np.array([
        [4, -5, -6, 7 * 0.5 + 1],
        [8, -9, -10, 11 * 0.5 + 2],
        [0, -1, -2, 3 * 0.5 + 3],
        [0, 0, 0, 1],
    ], np.float32)
    np.testing.assert_allclose(out, expected)


def test_generate_rays_matches_pinhole():
    rot = np.eye(3, dtype=np.float32)
    origin = np.array([0.0, 0.0, -2.0], np.float32)
    rays_o, rays_d = generate_rays(CAM, rot, origin, 24, 24)
    rays_o, rays_d = np.asarray(rays_o), np.asarray(rays_d)
    assert rays_o.shape == (576, 3)
    np.testing.assert_allclose(rays_o, origin[None, :].repeat(576, 0))
    np.testing.assert_allclose(np.linalg.norm(rays_d, axis=-1), 1.0,
                               rtol=1e-6)
    # center pixel of a 24x24 image with cx=cy=12: pixel (11,11) center
    # (11.5,11.5) -> dir ((11.5-12)/30, ., 1)/norm
    pid = 11 * 24 + 11
    ref = np.array([-0.5 / 30, -0.5 / 30, 1.0])
    ref /= np.linalg.norm(ref)
    np.testing.assert_allclose(rays_d[pid], ref, rtol=1e-5)


def test_near_far_slab():
    aabb = jnp.asarray([-1, -1, -1, 1, 1, 1], jnp.float32)
    o = jnp.asarray([[0, 0, -3], [0, 0, -3], [5, 5, -3]], jnp.float32)
    d = jnp.asarray([[0, 0, 1], [0.0, 1.0, 1.0], [0, 0, 1]], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
    near, far = np.asarray(near), np.asarray(far)
    np.testing.assert_allclose(near[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(far[0], 4.0, rtol=1e-6)
    fmax = np.finfo(np.float32).max
    assert near[2] == fmax and far[2] == fmax  # miss
    # diagonal ray misses the box too (crosses y=1 before z=-1)
    assert near[1] == fmax


def _setup(grid_h=32, density_scale=8.0):
    snap = make_synthetic_snapshot(seed=3, grid_h=grid_h,
                                   network_config=SMALL_CFG)
    settings = RenderSettings(
        bound=snap.settings.bound, cascade=snap.settings.cascade,
        grid_h=snap.settings.grid_h, mean_density=snap.settings.mean_density,
        aabb=snap.settings.aabb, density_scale=density_scale,
    )
    net = build_nerf_network(snap.config, bound=settings.bound)
    params = net.unpack_params(jnp.asarray(snap.params))
    grid = jnp.asarray(snap.density_grid)
    return net, params, grid, settings


def test_march_matches_reference_simulator():
    """The static-shape TPU marcher must reproduce the step-exact NumPy
    port of kernel_march_rays + kernel_composite_rays on a batch of rays
    that hit, graze, and miss the occupied sphere."""
    net, params, grid, settings = _setup()

    rot = np.eye(3, dtype=np.float32)
    origin = np.array([0.0, 0.0, -2.0], np.float32)
    cam = Camera(fl_x=16.0, fl_y=16.0, cx=8.0, cy=8.0)
    rays_o, rays_d = generate_rays(cam, rot, origin, 16, 16)
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray(settings.aabb, jnp.float32),
                                     settings.min_near)

    def apply_fn(p, pos01, dir01):
        return net.apply(p, pos01, dir01)

    def apply_cf(p, pos_cf, dir_cf):
        return net.apply_cf(p, pos_cf, dir_cf)

    res = render_rays(apply_cf, params, grid, rays_o, rays_d, nears, fars,
                      settings)

    ref_rgb, ref_depth, ref_wsum = render_rays_reference(
        apply_fn, params, np.asarray(grid), np.asarray(rays_o),
        np.asarray(rays_d), np.asarray(nears), np.asarray(fars), settings)

    np.testing.assert_allclose(np.asarray(res.weight_sum), ref_wsum,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.rgb), ref_rgb,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.depth), ref_depth,
                               rtol=2e-4, atol=2e-4)


def test_round_partition_invariance():
    """Results must not depend on the TPU-only S/P knobs."""
    net, params, grid, settings = _setup()
    rot = np.eye(3, dtype=np.float32)
    origin = np.array([0.3, -0.2, -2.0], np.float32)
    cam = Camera(fl_x=16.0, fl_y=16.0, cx=8.0, cy=8.0)
    rays_o, rays_d = generate_rays(cam, rot, origin, 16, 16)
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray(settings.aabb, jnp.float32),
                                     settings.min_near)

    def apply_cf(p, pos_cf, dir_cf):
        return net.apply_cf(p, pos_cf, dir_cf)

    import dataclasses

    a = render_rays(apply_cf, params, grid, rays_o, rays_d, nears, fars,
                    dataclasses.replace(settings, samples_per_round=4,
                                        probes_per_round=8))
    b = render_rays(apply_cf, params, grid, rays_o, rays_d, nears, fars,
                    dataclasses.replace(settings, samples_per_round=16,
                                        probes_per_round=32,
                                        ray_chunk=64))
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.weight_sum),
                               np.asarray(b.weight_sum), rtol=1e-4,
                               atol=1e-4)


def test_engine_end_to_end():
    snap = make_synthetic_snapshot(seed=3, grid_h=32,
                                   network_config=SMALL_CFG)
    eng = NerfRender(settings=RenderSettings(density_scale=8.0))
    eng.load_from_snapshot(snap)
    eng.set_resolution((24, 24))
    img = eng.render_frame(CAM, NERF_POSE)
    assert img.rgb.shape == (24, 24, 3) and img.rgb.dtype == np.uint8
    assert img.depth.shape == (24, 24)
    rgbf, depthf, wsum = eng.render_frame_arrays(CAM, NERF_POSE)
    wsum = np.asarray(wsum).reshape(24, 24)
    # center rays pass through the occupied sphere, corners miss the aabb
    assert wsum[12, 12] > 0.05
    assert wsum[0, 0] == 0.0
    d = np.asarray(depthf)
    assert np.all((d >= 0) & (d <= 1))


def test_demand_profile_planned_frames_identical():
    """Frame 2+ of an engine run in PLAN mode (hostloop.py demand-profile
    scheduling: whole segments issued ahead with last frame's buckets)
    and must equal the reactive frame 1 within round-partition
    reassociation ULPs (the plan changes bucket schedules = composite
    round partitioning, the same equivalence class as cap_emit/freeze);
    a pose change that invalidates every planned demand must still
    render correctly (freeze + reactive escalation reclaim the drift)."""
    snap = make_synthetic_snapshot(seed=3, grid_h=32,
                                   network_config=SMALL_CFG)
    s = RenderSettings(density_scale=8.0, ray_chunk=128, cap_emit=4,
                       probes_per_round=16, bucket_set=(64, 256),
                       ray_bucket_set=(128, 32))
    eng = NerfRender(settings=s)
    eng.load_from_snapshot(snap)
    eng.set_resolution((24, 24))
    r1 = eng.render_frame_arrays(CAM, NERF_POSE)   # reactive (no plan)
    r2 = eng.render_frame_arrays(CAM, NERF_POSE)   # plan mode
    r3 = eng.render_frame_arrays(CAM, NERF_POSE)   # converged plan
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    for a, b in zip(r1, r3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # now a very different pose: the stale plan's buckets/segments are
    # wrong everywhere — output must still equal a fresh engine's
    side_pose = np.array([[0, 0, 1, 6], [0, 1, 0, 0], [-1, 0, 0, 0],
                          [0, 0, 0, 1]], np.float32)
    r_side = eng.render_frame_arrays(CAM, side_pose)
    eng_fresh = NerfRender(settings=s)
    eng_fresh.load_from_snapshot(snap)
    eng_fresh.set_resolution((24, 24))
    r_ref = eng_fresh.render_frame_arrays(CAM, side_pose)
    for a, b in zip(r_side, r_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_engine_sharded_matches_single():
    if len(jax.devices()) < 4:
        pytest.skip("needs multi-device CPU mesh")
    from nerf_tpu.parallel.mesh import make_mesh

    snap = make_synthetic_snapshot(seed=3, grid_h=32,
                                   network_config=SMALL_CFG)
    eng1 = NerfRender(settings=RenderSettings(density_scale=8.0))
    eng1.load_from_snapshot(snap)
    eng1.set_resolution((16, 16))
    rgb1, depth1, w1 = eng1.render_frame_arrays(CAM, NERF_POSE)

    mesh = make_mesh(4)
    eng4 = NerfRender(settings=RenderSettings(density_scale=8.0), mesh=mesh)
    eng4.load_from_snapshot(snap)
    eng4.set_resolution((16, 16))
    rgb4, depth4, w4 = eng4.render_frame_arrays(CAM, NERF_POSE)

    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb4),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w4), rtol=1e-4,
                               atol=1e-4)


def test_perturb_mode():
    """perturb adds stochastic start jitter (render_utils.h:586-589);
    output stays finite and close to the unperturbed render."""
    import dataclasses

    net, params, grid, settings = _setup()
    rot = np.eye(3, dtype=np.float32)
    origin = np.array([0.0, 0.0, -2.0], np.float32)
    cam = Camera(fl_x=16.0, fl_y=16.0, cx=8.0, cy=8.0)
    rays_o, rays_d = generate_rays(cam, rot, origin, 8, 8)
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray(settings.aabb, jnp.float32),
                                     settings.min_near)

    def apply_cf(p, pos_cf, dir_cf):
        return net.apply_cf(p, pos_cf, dir_cf)

    base = render_rays(apply_cf, params, grid, rays_o, rays_d, nears, fars,
                       settings)
    pert = render_rays(apply_cf, params, grid, rays_o, rays_d, nears, fars,
                       dataclasses.replace(settings, perturb=7))
    assert np.all(np.isfinite(np.asarray(pert.rgb)))
    diff = np.abs(np.asarray(pert.rgb) - np.asarray(base.rgb)).max()
    assert 0 < diff < 0.2, diff


def test_march_cascade2_matches_simulator():
    """Multi-cascade occupancy (mip_from_pos levels) vs the NumPy port.

    Note: occupancy must be structured (smooth shells), not random noise —
    XLA fuses `o + t*d` into an FMA while NumPy rounds the product, so
    positions can differ by 1 ulp; with random per-voxel occupancy those
    ulps flip knife-edge voxel decisions and the comparison becomes
    meaningless (both streams are valid marches of ulp-perturbed rays).
    """
    snap = make_synthetic_snapshot(seed=5, grid_h=16, cascade=2, bound=2.0,
                                   network_config=SMALL_CFG)
    settings = RenderSettings(
        bound=2.0, cascade=2, grid_h=16,
        mean_density=snap.settings.mean_density,
        aabb=(-2.0, -2.0, -2.0, 2.0, 2.0, 2.0), density_scale=8.0)
    net = build_nerf_network(snap.config, bound=2.0)
    params = net.unpack_params(jnp.asarray(snap.params))
    # cascade 1: a larger shell, so level selection matters
    h = 16
    coords = (np.arange(h, dtype=np.float32) + 0.5) / h * 2.0 - 1.0
    gx, gy, gz = np.meshgrid(coords, coords, coords, indexing="ij")
    r = np.sqrt(gx * gx + gy * gy + gz * gz)
    g = np.asarray(snap.density_grid).copy()
    g[h ** 3:] = np.where((r > 0.3) & (r < 0.8), 1.0, 0.0).reshape(-1)
    grid = jnp.asarray(g)

    rot = np.eye(3, dtype=np.float32)
    origin = np.array([0.1, -0.3, -3.5], np.float32)
    cam = Camera(fl_x=8.0, fl_y=8.0, cx=4.0, cy=4.0)
    rays_o, rays_d = generate_rays(cam, rot, origin, 8, 8)
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray(settings.aabb, jnp.float32),
                                     settings.min_near)

    def apply_fn(p, pos01, dir01):
        return net.apply(p, pos01, dir01)

    def apply_cf(p, pos_cf, dir_cf):
        return net.apply_cf(p, pos_cf, dir_cf)

    res = render_rays(apply_cf, params, grid, rays_o, rays_d, nears, fars,
                      settings)
    ref_rgb, ref_depth, ref_wsum = render_rays_reference(
        apply_fn, params, np.asarray(grid), np.asarray(rays_o),
        np.asarray(rays_d), np.asarray(nears), np.asarray(fars), settings)
    np.testing.assert_allclose(np.asarray(res.weight_sum), ref_wsum,
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(res.rgb), ref_rgb, rtol=3e-4,
                               atol=3e-4)


def test_skip_field_cascade2_preserves_emissions():
    """cascade>1 fast march (VERDICT r3 item 5): per-mip skip slabs +
    mip-gated ball adoption must emit the IDENTICAL sample set as the
    no-skip march on a bound=2, cascade=2 scene, in fewer rounds."""
    import dataclasses

    from nerf_tpu.core.types import DENSITY_THRESH
    from nerf_tpu.render.density_grid import build_skip_field
    from nerf_tpu.render.march import render_rays_hostloop

    snap = make_synthetic_snapshot(seed=5, grid_h=16, cascade=2, bound=2.0,
                                   network_config=SMALL_CFG)
    settings = RenderSettings(
        bound=2.0, cascade=2, grid_h=16,
        mean_density=snap.settings.mean_density,
        aabb=(-2.0, -2.0, -2.0, 2.0, 2.0, 2.0), density_scale=8.0,
        ray_chunk=100, probes_per_round=8, extend_steps=8,
        chain_balls=3, chain_steps=6)
    net = build_nerf_network(snap.config, bound=2.0)
    params = net.unpack_params(jnp.asarray(snap.params))
    h = 16
    coords = (np.arange(h, dtype=np.float32) + 0.5) / h * 2.0 - 1.0
    gx, gy, gz = np.meshgrid(coords, coords, coords, indexing="ij")
    r = np.sqrt(gx * gx + gy * gy + gz * gz)
    g = np.asarray(snap.density_grid).copy()
    g[h ** 3:] = np.where((r > 0.3) & (r < 0.8), 1.0, 0.0).reshape(-1)
    grid = jnp.asarray(g)

    rot = np.eye(3, dtype=np.float32)
    origin = np.array([0.1, -0.3, -3.5], np.float32)
    cam = Camera(fl_x=8.0, fl_y=8.0, cx=4.0, cy=4.0)
    rays_o, rays_d = generate_rays(cam, rot, origin, 10, 10)
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray(settings.aabb, jnp.float32),
                                     settings.min_near)

    def apply_cf(p, pos_cf, dir_cf):
        return net.apply_cf(p, pos_cf, dir_cf)

    thresh = min(DENSITY_THRESH, settings.mean_density)
    sf = build_skip_field(grid, jnp.float32(thresh), settings.grid_h,
                          settings.cascade, 16)
    # march-level emission-stream identity (the exactness claim): drive
    # _march_round_deep directly so the compositor's partition-dependent
    # termination round does not perturb the counts
    from nerf_tpu.render.march import _march_round_deep

    def march_stream(sfield):
        m = 100
        o_cf, d_cf = rays_o.T, rays_d.T
        t, alive = nears, nears < fars
        ne = jnp.zeros((m,), jnp.int32)
        sh = jnp.zeros((m,), jnp.float32)
        total, rounds = 0, 0
        while bool(jnp.any(alive)) and rounds < 200:
            out = _march_round_deep(t, alive, o_cf, d_cf, fars, grid,
                                    settings, ne, sh, skip_field=sfield)
            t, ne, sh = out[0], out[5], out[6]
            total += int(jnp.sum(out[4].astype(jnp.int32)))
            alive = alive & (t < fars) & (ne < settings.max_infer_steps)
            rounds += 1
        return total, rounds

    k_base, r_base = march_stream(None)
    k_skip, r_skip = march_stream(sf)
    assert k_base == k_skip, (k_base, k_skip)
    assert r_skip < r_base, (r_skip, r_base)

    # and the full host-loop frames agree (round-partition ULP class)
    base = render_rays_hostloop(apply_cf, params, grid, rays_o, rays_d,
                                nears, fars, settings)
    skip = render_rays_hostloop(apply_cf, params, grid, rays_o, rays_d,
                                nears, fars, settings, skip_field=sf)
    np.testing.assert_allclose(np.asarray(skip.rgb), np.asarray(base.rgb),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(skip.depth),
                               np.asarray(base.depth), rtol=1e-5,
                               atol=1e-5)


def test_render_frame_spp():
    snap = make_synthetic_snapshot(seed=3, grid_h=32,
                                   network_config=SMALL_CFG)
    eng = NerfRender(settings=RenderSettings(density_scale=8.0))
    eng.load_from_snapshot(snap)
    eng.set_resolution((16, 16))
    surf = np.asarray(eng.render_frame_spp(CAM, NERF_POSE, spp=2))
    assert surf.shape == (16, 16, 4)
    assert np.all(np.isfinite(surf))
    assert np.all((surf[..., :3] >= 0) & (surf[..., :3] <= 1))


def test_hostloop_matches_device_loop():
    """The host-driven round loop must match the on-device while_loop."""
    import dataclasses

    from nerf_tpu.render.march import render_rays_hostloop

    net, params, grid, settings = _setup()
    rot = np.eye(3, dtype=np.float32)
    origin = np.array([0.1, 0.2, -2.0], np.float32)
    cam = Camera(fl_x=16.0, fl_y=16.0, cx=8.0, cy=8.0)
    rays_o, rays_d = generate_rays(cam, rot, origin, 16, 16)
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray(settings.aabb, jnp.float32),
                                     settings.min_near)

    def apply_cf(p, pos_cf, dir_cf):
        return net.apply_cf(p, pos_cf, dir_cf)

    dev = render_rays(apply_cf, params, grid, rays_o, rays_d, nears, fars,
                      settings)
    host = render_rays_hostloop(apply_cf, params, grid, rays_o, rays_d,
                                nears, fars,
                                dataclasses.replace(settings, ray_chunk=100))
    np.testing.assert_allclose(np.asarray(host.rgb), np.asarray(dev.rgb),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(host.weight_sum),
                               np.asarray(dev.weight_sum), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(host.depth),
                               np.asarray(dev.depth), rtol=1e-5, atol=1e-5)


def test_engine_hostloop_mode():
    import dataclasses

    snap = make_synthetic_snapshot(seed=3, grid_h=32,
                                   network_config=SMALL_CFG)
    eng = NerfRender(settings=RenderSettings(density_scale=8.0,
                                             host_loop=True))
    eng.load_from_snapshot(snap)
    eng.set_resolution((16, 16))
    rgb_h, _, w_h = eng.render_frame_arrays(CAM, NERF_POSE)

    eng2 = NerfRender(settings=RenderSettings(density_scale=8.0))
    eng2.load_from_snapshot(snap)
    eng2.set_resolution((16, 16))
    rgb_d, _, w_d = eng2.render_frame_arrays(CAM, NERF_POSE)
    np.testing.assert_allclose(np.asarray(rgb_h), np.asarray(rgb_d),
                               rtol=1e-5, atol=1e-5)


def test_hostloop_ray_compaction_matches_device_loop():
    """Cross-round ray compaction (march working-set shrinks through the
    bucket ladder) must not change the image vs the on-device while_loop."""
    import dataclasses

    from nerf_tpu.render.march import render_rays_hostloop

    net, params, grid, settings = _setup()
    rot = np.eye(3, dtype=np.float32)
    # camera aimed mostly off-scene: only a minority of rays intersect the
    # aabb, so the first alive-count readback forces a ladder compaction
    # deterministically
    origin = np.array([1.6, 1.7, -2.0], np.float32)
    cam = Camera(fl_x=16.0, fl_y=16.0, cx=8.0, cy=8.0)
    rays_o, rays_d = generate_rays(cam, rot, origin, 16, 16)
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray(settings.aabb, jnp.float32),
                                     settings.min_near)
    n_hit = int(jnp.sum((nears < fars).astype(jnp.int32)))
    assert 0 < n_hit < 64, n_hit

    def apply_cf(p, pos_cf, dir_cf):
        return net.apply_cf(p, pos_cf, dir_cf)

    dev = render_rays(apply_cf, params, grid, rays_o, rays_d, nears, fars,
                      settings)
    stats = {}
    host = render_rays_hostloop(
        apply_cf, params, grid, rays_o, rays_d, nears, fars,
        dataclasses.replace(settings, ray_chunk=256,
                            ray_bucket_set=(256, 64, 16)),
        stats=stats)
    # the ladder must actually engage (rays die as the march progresses)
    assert min(r["m"] for r in stats["rounds"]) < 256, stats["rounds"]
    np.testing.assert_allclose(np.asarray(host.rgb), np.asarray(dev.rgb),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(host.weight_sum),
                               np.asarray(dev.weight_sum), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(host.depth),
                               np.asarray(dev.depth), rtol=1e-5, atol=1e-5)


def test_merged_bucket_freeze_matches_device_loop():
    """The merged round program picks its eval bucket from the PREVIOUS
    round's sample count; at surface-crossing rounds demand exceeds the
    bucket and rays FREEZE at the bucket boundary (march.py pass 3),
    resuming at the frozen probe next round. The whole-frame emission
    stream is unchanged, so the frame must match the device loop within
    round-partition reassociation ULPs."""
    import dataclasses

    from nerf_tpu.render.march import render_rays_hostloop

    net, params, grid, settings = _setup()
    rot = np.eye(3, dtype=np.float32)
    origin = np.array([0.1, 0.2, -2.0], np.float32)
    cam = Camera(fl_x=16.0, fl_y=16.0, cx=8.0, cy=8.0)
    rays_o, rays_d = generate_rays(cam, rot, origin, 16, 16)
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray(settings.aabb, jnp.float32),
                                     settings.min_near)

    def apply_cf(p, pos_cf, dir_cf):
        return net.apply_cf(p, pos_cf, dir_cf)

    dev = render_rays(apply_cf, params, grid, rays_o, rays_d, nears, fars,
                      settings)
    stats = {}
    # a tiny bucket table guarantees at least one freezing round
    host = render_rays_hostloop(
        apply_cf, params, grid, rays_o, rays_d, nears, fars,
        dataclasses.replace(settings, ray_chunk=100, bucket_set=(32, 128)),
        stats=stats)
    assert sum(r["frozen"] for r in stats["rounds"]) >= 1, stats["rounds"]
    np.testing.assert_allclose(np.asarray(host.rgb), np.asarray(dev.rgb),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(host.weight_sum),
                               np.asarray(dev.weight_sum), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(host.depth),
                               np.asarray(dev.depth), rtol=1e-5, atol=1e-5)


def test_skip_field_extension_preserves_emissions():
    """The lattice-exact empty-space extension must emit the IDENTICAL
    sample set (march.py pass 4 docstring) in fewer rounds; the frame may
    differ only by round-partition reassociation ULPs."""
    import dataclasses

    from nerf_tpu.core.types import DENSITY_THRESH
    from nerf_tpu.render.density_grid import build_skip_field
    from nerf_tpu.render.march import render_rays_hostloop

    net, params, grid, settings = _setup()
    rot = np.eye(3, dtype=np.float32)
    origin = np.array([0.1, 0.2, -2.0], np.float32)
    cam = Camera(fl_x=16.0, fl_y=16.0, cx=8.0, cy=8.0)
    rays_o, rays_d = generate_rays(cam, rot, origin, 16, 16)
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray(settings.aabb, jnp.float32),
                                     settings.min_near)

    def apply_cf(p, pos_cf, dir_cf):
        return net.apply_cf(p, pos_cf, dir_cf)

    thresh = min(DENSITY_THRESH, settings.mean_density)
    sf = build_skip_field(grid, jnp.float32(thresh), settings.grid_h,
                          settings.cascade, 32)
    s1 = dataclasses.replace(settings, ray_chunk=100)
    base_stats, skip_stats = {}, {}
    base = render_rays_hostloop(apply_cf, params, grid, rays_o, rays_d,
                                nears, fars, s1, stats=base_stats)
    skip = render_rays_hostloop(apply_cf, params, grid, rays_o, rays_d,
                                nears, fars, s1, stats=skip_stats,
                                skip_field=sf)
    # identical emissions, fewer rounds
    assert (sum(r["k"] for r in skip_stats["rounds"])
            == sum(r["k"] for r in base_stats["rounds"]))
    assert len(skip_stats["rounds"]) < len(base_stats["rounds"])
    np.testing.assert_allclose(np.asarray(skip.rgb), np.asarray(base.rgb),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(skip.depth),
                               np.asarray(base.depth), rtol=1e-5, atol=1e-6)

    # chained balls (pass 4 chain: per-ball df re-gather + free-ball
    # walk) preserve the emission set too, in at most as many rounds
    s_chain = dataclasses.replace(s1, probes_per_round=8, extend_steps=8,
                                  chain_balls=4, chain_steps=6)
    s_plain = dataclasses.replace(s_chain, chain_balls=0, extend_steps=0)
    chain_stats, plain_stats = {}, {}
    chain = render_rays_hostloop(apply_cf, params, grid, rays_o, rays_d,
                                 nears, fars, s_chain, stats=chain_stats,
                                 skip_field=sf)
    plain = render_rays_hostloop(apply_cf, params, grid, rays_o, rays_d,
                                 nears, fars, s_plain, stats=plain_stats,
                                 skip_field=sf)
    assert (sum(r["k"] for r in chain_stats["rounds"])
            == sum(r["k"] for r in plain_stats["rounds"]))
    assert len(chain_stats["rounds"]) < len(plain_stats["rounds"])
    np.testing.assert_allclose(np.asarray(chain.rgb), np.asarray(plain.rgb),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(chain.depth),
                               np.asarray(plain.depth), rtol=1e-5,
                               atol=1e-6)


def test_packed_skip_rows_bit_identical():
    """Width-packed skip-field rows (pack_skip_field + skip_row_w) change
    only HOW the march fetches the field (w-cell row gather + lane
    select), not any value — frames must be BIT-identical to the
    unpacked field."""
    import dataclasses

    from nerf_tpu.core.types import DENSITY_THRESH
    from nerf_tpu.render.density_grid import build_skip_field, \
        pack_skip_field
    from nerf_tpu.render.march import render_rays_hostloop

    net, params, grid, settings = _setup()
    rot = np.eye(3, dtype=np.float32)
    origin = np.array([0.1, 0.2, -2.0], np.float32)
    cam = Camera(fl_x=16.0, fl_y=16.0, cx=8.0, cy=8.0)
    rays_o, rays_d = generate_rays(cam, rot, origin, 16, 16)
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray(settings.aabb, jnp.float32),
                                     settings.min_near)

    def apply_cf(p, pos_cf, dir_cf):
        return net.apply_cf(p, pos_cf, dir_cf)

    thresh = min(DENSITY_THRESH, settings.mean_density)
    sf = build_skip_field(grid, jnp.float32(thresh), settings.grid_h,
                          settings.cascade, 32)
    s1 = dataclasses.replace(settings, ray_chunk=100)
    base = render_rays_hostloop(apply_cf, params, grid, rays_o, rays_d,
                                nears, fars, s1, skip_field=sf)
    for w in (2, 4):
        packed = render_rays_hostloop(
            apply_cf, params, grid, rays_o, rays_d, nears, fars,
            dataclasses.replace(s1, skip_row_w=w),
            skip_field=pack_skip_field(sf, w))
        np.testing.assert_array_equal(np.asarray(packed.rgb),
                                      np.asarray(base.rgb))
        np.testing.assert_array_equal(np.asarray(packed.depth),
                                      np.asarray(base.depth))


def test_cap_emit_matches_device_loop():
    """The per-round emission cap (cap_emit, the reference's num_step<=8
    analog) repartitions rounds without changing the emission stream —
    the frame must match the uncapped device loop."""
    import dataclasses

    from nerf_tpu.core.types import DENSITY_THRESH
    from nerf_tpu.render.density_grid import build_skip_field
    from nerf_tpu.render.march import render_rays_hostloop

    net, params, grid, settings = _setup()
    rot = np.eye(3, dtype=np.float32)
    origin = np.array([0.0, 0.1, -2.0], np.float32)
    cam = Camera(fl_x=16.0, fl_y=16.0, cx=8.0, cy=8.0)
    rays_o, rays_d = generate_rays(cam, rot, origin, 16, 16)
    nears, fars = near_far_from_aabb(rays_o, rays_d,
                                     jnp.asarray(settings.aabb, jnp.float32),
                                     settings.min_near)

    def apply_cf(p, pos_cf, dir_cf):
        return net.apply_cf(p, pos_cf, dir_cf)

    dev = render_rays(apply_cf, params, grid, rays_o, rays_d, nears, fars,
                      settings)
    thresh = min(DENSITY_THRESH, settings.mean_density)
    sf = build_skip_field(grid, jnp.float32(thresh), settings.grid_h,
                          settings.cascade, 32)
    stats = {}
    host = render_rays_hostloop(
        apply_cf, params, grid, rays_o, rays_d, nears, fars,
        dataclasses.replace(settings, ray_chunk=100, cap_emit=4),
        stats=stats, skip_field=sf)
    # the cap engages (more rounds than probes-per-round alone implies)
    assert max(r["k"] for r in stats["rounds"]) > 0
    np.testing.assert_allclose(np.asarray(host.rgb), np.asarray(dev.rgb),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(host.weight_sum),
                               np.asarray(dev.weight_sum), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(host.depth),
                               np.asarray(dev.depth), rtol=1e-4, atol=1e-4)


def test_sharded_hostloop_matches_single_device():
    """The shard_mapped host-loop renderer (per-device ray blocks, local
    compaction, max-count bucket decisions) must reproduce the
    single-device frame (reference analog: NGPU data parallelism,
    nerf_render.cu:252-362)."""
    import dataclasses

    from nerf_tpu.core.snapshot import make_synthetic_snapshot
    from nerf_tpu.parallel.mesh import make_mesh

    snap = make_synthetic_snapshot(seed=3, grid_h=32,
                                   network_config=SMALL_CFG)
    base = RenderSettings(density_scale=8.0, host_loop=True,
                          ray_bucket_set=(64, 16))
    eng1 = NerfRender(settings=base)
    eng1.load_from_snapshot(snap)
    eng1.set_resolution((16, 16))
    rgb1, d1, w1 = eng1.render_frame_arrays(CAM, NERF_POSE)

    mesh = make_mesh(4)
    eng2 = NerfRender(settings=base, mesh=mesh)
    eng2.load_from_snapshot(snap)
    eng2.set_resolution((16, 16))
    rgb2, d2, w2 = eng2.render_frame_arrays(CAM, NERF_POSE)

    np.testing.assert_allclose(np.asarray(rgb2), np.asarray(rgb1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=1e-5, atol=1e-5)


def test_plan_steady_state_freeze_free_dense_scene():
    """Dense-scene scheduler regression (VERDICT r4 weak #3): with the
    bucket ladder's top rung equal to cap_emit*ray_chunk, bucket demand
    can never exceed the ladder, and with the exact k+spill demand
    signal the plan converges to a freeze-free steady state on a fog
    scene (the r4 800x800 collapse mode — 837k frozen-ray rounds when
    peak demand exceeded the top rung — pinned at test scale)."""
    snap = make_synthetic_snapshot(seed=3, grid_h=32,
                                   network_config=SMALL_CFG)
    s = RenderSettings(density_scale=8.0, ray_chunk=256, cap_emit=4,
                       probes_per_round=16,
                       bucket_set=(64, 128, 256, 512, 1024),
                       ray_bucket_set=(256, 64))
    eng = NerfRender(settings=s)
    eng.load_from_snapshot(snap)
    eng.set_resolution((24, 24))
    eng.collect_stats = True
    eng.render_frame_arrays(CAM, NERF_POSE)      # reactive (no plan)
    eng.render_frame_arrays(CAM, NERF_POSE)      # plan, converging
    eng.render_frame_arrays(CAM, NERF_POSE)      # plan, converging
    eng.render_frame_arrays(CAM, NERF_POSE)      # steady state
    st = eng.last_stats["rounds"]
    assert sum(r["frozen"] for r in st) == 0, st
    assert sum(r["spill"] for r in st) == 0, st
