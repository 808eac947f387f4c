"""Hybrid exact grid encoding (encodings/hybrid.py): row-served levels
must reproduce the tcnn-exact path to reassociation ULPs on samples the
march can produce (occupied cells), and the engine-level conversion must
leave rendered frames equal to the pure tcnn render."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.encodings.convert import tcnn_to_tpugrid
from nerf_tpu.encodings.hashgrid import GridEncoding
from nerf_tpu.encodings.hybrid import (
    HybridGridEncoding,
    build_hybrid_from_conversion,
)
from nerf_tpu.encodings.tpugrid import TpuGridEncoding

CFG = dict(otype="HashGrid", n_levels=6, n_features_per_level=2,
           log2_hashmap_size=12, base_resolution=16, per_level_scale=1.5)


def _sphere_grid(h=32, r0=0.3, r1=0.6):
    coords = (np.arange(h) + 0.5) / h * 2 - 1
    gx, gy, gz = np.meshgrid(coords, coords, coords, indexing="ij")
    r = np.sqrt(gx * gx + gy * gy + gz * gz)
    return np.where((r > r0) & (r < r1), 1.0, 0.0).reshape(-1).astype(
        np.float32)


def _occupied_points(dg, h, n=512, seed=3):
    pts = np.random.RandomState(seed).uniform(0, 1, (16000, 3)).astype(
        np.float32)
    cell = np.clip((pts * h).astype(int), 0, h - 1)
    occ = dg.reshape(h, h, h)[cell[:, 0], cell[:, 1], cell[:, 2]] > 0.01
    pts = pts[occ][:n]
    assert len(pts) > 100
    return jnp.asarray(pts.T)


def _build(log2_rows=18):
    tc = GridEncoding(3, CFG)
    params = np.asarray(jax.random.normal(
        jax.random.PRNGKey(0), (tc.n_params,), jnp.float32))
    h = 32
    dg = _sphere_grid(h)
    tpu = TpuGridEncoding(3, dict(n_levels=6, n_features_per_level=2,
                                  log2_rows=log2_rows, base_resolution=16,
                                  per_level_scale=1.5,
                                  packed_gather=False))
    rows, stats = tcnn_to_tpugrid(tc, params, tpu, density_grid=dg,
                                  grid_h=h, bound=1.0,
                                  density_thresh=0.01)
    hyb, flat = build_hybrid_from_conversion(tc, params, tpu, rows, stats)
    return tc, params, hyb, flat, dg, h, stats


def test_hybrid_parity_on_occupied_samples():
    tc, params, hyb, flat, dg, h, stats = _build(log2_rows=18)
    # at log2_rows=18 every level of this schedule is dense -> all exact
    assert all(hyb.exact_levels), (hyb.exact_levels, stats["levels"])
    x = _occupied_points(dg, h)
    a = np.asarray(tc.apply_cf(jnp.asarray(params), x))
    b = np.asarray(hyb.apply_cf(jnp.asarray(flat), x))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_hybrid_mixed_levels_parity():
    """With a small row budget some levels stay on the 8-corner path;
    the interleaved level-major output must still match tcnn exactly on
    corner-served levels and to conversion accuracy on row-served ones
    (collision-free rows -> exact there too)."""
    tc, params, hyb, flat, dg, h, stats = _build(log2_rows=11)
    assert any(hyb.exact_levels) and not all(hyb.exact_levels), \
        hyb.exact_levels
    x = _occupied_points(dg, h)
    a = np.asarray(tc.apply_cf(jnp.asarray(params), x))
    b = np.asarray(hyb.apply_cf(jnp.asarray(flat), x))
    F = tc.n_features_per_level
    for lvl in range(tc.n_levels):
        np.testing.assert_allclose(
            b[lvl * F:(lvl + 1) * F], a[lvl * F:(lvl + 1) * F],
            rtol=1e-5, atol=1e-6,
            err_msg=f"level {lvl} exact={hyb.exact_levels[lvl]}")


def test_hybrid_prepared_packed_parity():
    """Prepared (packed bf16) hybrid vs prepared packed tcnn: identical
    quantization on both sides, so parity holds at bf16 tolerance."""
    tc, params, hyb, flat, dg, h, stats = _build(log2_rows=18)
    tc.packed_gather = True
    hyb.packed_gather = True
    x = _occupied_points(dg, h)
    a = np.asarray(tc.apply_cf(tc.prepare_params(jnp.asarray(params)), x))
    b = np.asarray(hyb.apply_cf(hyb.prepare_params(jnp.asarray(flat)), x))
    np.testing.assert_allclose(b, a, rtol=1e-2, atol=1e-2)


def test_engine_convert_to_hybrid_render_parity():
    from nerf_tpu.core.snapshot import make_synthetic_snapshot
    from nerf_tpu.core.types import Camera, RenderSettings
    from nerf_tpu.render.engine import NerfRender

    cfg = {
        "encoding": dict(CFG),
        "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": 64,
                    "n_hidden_layers": 1},
        "dir_encoding": {"otype": "SphericalHarmonics", "degree": 4},
        "rgb_network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                        "output_activation": "None", "n_neurons": 64,
                        "n_hidden_layers": 2},
    }
    snap = make_synthetic_snapshot(seed=3, grid_h=32, network_config=cfg)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 6],
                     [0, 0, 0, 1]], np.float32)
    cam = Camera(fl_x=30.0, fl_y=30.0, cx=8.0, cy=8.0)

    eng = NerfRender(settings=RenderSettings(density_scale=8.0))
    eng.load_from_snapshot(snap)
    eng.set_resolution((16, 16))
    rgb_ref, _, w_ref = eng.render_frame_arrays(cam, pose)

    stats = eng.convert_to_hybrid()
    assert isinstance(eng.network.pos_encoding, HybridGridEncoding)
    assert any(stats["exact_levels"]), stats
    rgb_h, _, w_h = eng.render_frame_arrays(cam, pose)
    np.testing.assert_allclose(np.asarray(rgb_h), np.asarray(rgb_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_h), np.asarray(w_ref),
                               rtol=1e-4, atol=1e-5)
