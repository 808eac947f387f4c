"""tcnn-table -> TpuGrid brick-row conversion (encodings/convert.py):
dense-level conversion must be EXACT; hashed levels are exact per brick
with collisions averaged; the engine-level path must render a foreign
snapshot through TpuGrid close to the tcnn-exact render."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.encodings.convert import tcnn_to_tpugrid
from nerf_tpu.encodings.hashgrid import GridEncoding
from nerf_tpu.encodings.tpugrid import TpuGridEncoding

CFG = dict(otype="HashGrid", n_levels=6, n_features_per_level=2,
           log2_hashmap_size=12, base_resolution=16, per_level_scale=1.5)


def _sphere_grid(h=32, r0=0.3, r1=0.6):
    coords = (np.arange(h) + 0.5) / h * 2 - 1
    gx, gy, gz = np.meshgrid(coords, coords, coords, indexing="ij")
    r = np.sqrt(gx * gx + gy * gy + gz * gz)
    return np.where((r > r0) & (r < r1), 1.0, 0.0).reshape(-1).astype(
        np.float32)


def test_dense_conversion_exact():
    tc = GridEncoding(3, CFG)
    tcnn_params = np.asarray(jax.random.normal(
        jax.random.PRNGKey(0), (tc.n_params,), jnp.float32))
    tpu = TpuGridEncoding(3, dict(n_levels=6, n_features_per_level=2,
                                  log2_rows=18, base_resolution=16,
                                  per_level_scale=1.5,
                                  packed_gather=False))
    assert all(tpu._dense)
    params, stats = tcnn_to_tpugrid(tc, tcnn_params, tpu)
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 1024), jnp.float32)
    a = np.asarray(tc.apply_cf(jnp.asarray(tcnn_params), x))
    b = np.asarray(tpu.apply_cf(jnp.asarray(params), x))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)
    assert all(L["collided_rows"] == 0 for L in stats["levels"])


def test_dense_conversion_exact_brick4():
    """Dense-level exactness holds for the 4^3-brick quality rows too
    (the converter fills w*b+{0..w} neighborhoods generically)."""
    tc = GridEncoding(3, CFG)
    tcnn_params = np.asarray(jax.random.normal(
        jax.random.PRNGKey(0), (tc.n_params,), jnp.float32))
    tpu = TpuGridEncoding(3, dict(n_levels=6, n_features_per_level=2,
                                  log2_rows=18, base_resolution=16,
                                  per_level_scale=1.5, brick_w=4,
                                  packed_gather=False))
    assert all(tpu._dense)
    params, stats = tcnn_to_tpugrid(tc, tcnn_params, tpu)
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 1024), jnp.float32)
    a = np.asarray(tc.apply_cf(jnp.asarray(tcnn_params), x))
    b = np.asarray(tpu.apply_cf(jnp.asarray(params), x))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)
    assert all(L["collided_rows"] == 0 for L in stats["levels"])


def test_hashed_conversion_covers_occupied_samples():
    """With collisions, occupied-region samples must still round-trip:
    collision-free rows exactly, collided rows as brick averages (finite,
    bounded by the input range)."""
    tc = GridEncoding(3, CFG)
    tcnn_params = np.asarray(jax.random.normal(
        jax.random.PRNGKey(0), (tc.n_params,), jnp.float32))
    h = 32
    dg = _sphere_grid(h)
    tpu = TpuGridEncoding(3, dict(n_levels=6, n_features_per_level=2,
                                  log2_rows=10, base_resolution=16,
                                  per_level_scale=1.5,
                                  packed_gather=False))
    params, stats = tcnn_to_tpugrid(tc, tcnn_params, tpu, density_grid=dg,
                                    grid_h=h, bound=1.0,
                                    density_thresh=0.01)
    # coarse dense levels fully converted and collision-free
    assert stats["levels"][0]["collided_rows"] == 0
    # samples inside occupied cells
    pts = np.random.RandomState(3).uniform(0, 1, (8000, 3)).astype(
        np.float32)
    cell = np.clip((pts * h).astype(int), 0, h - 1)
    occ = dg.reshape(h, h, h)[cell[:, 0], cell[:, 1], cell[:, 2]] > 0.01
    pts = pts[occ][:512]
    assert len(pts) > 100
    xo = jnp.asarray(pts.T)
    a = np.asarray(tc.apply_cf(jnp.asarray(tcnn_params), xo))
    b = np.asarray(tpu.apply_cf(jnp.asarray(params), xo))
    assert np.isfinite(b).all()
    # dense levels (first rows of output, level-major) are exact
    n_dense = sum(2 for L, d in zip(stats["levels"], tpu._dense) if d)
    np.testing.assert_allclose(b[:n_dense], a[:n_dense], rtol=1e-5,
                               atol=1e-5)
    # collided hashed levels stay within the value range (averaging)
    assert np.abs(b).max() <= np.abs(tcnn_params).max() + 1e-5


def test_engine_convert_foreign_snapshot():
    """engine.convert_to_tpugrid: foreign hashgrid snapshot re-encoded
    onto the TpuGrid fast path must render close to the tcnn render (the
    synthetic snapshot has random weights, so tolerances are loose; a
    trained-scene PSNR record backs the real claim in BASELINE.md)."""
    from nerf_tpu.core.snapshot import make_synthetic_snapshot
    from nerf_tpu.core.types import Camera, RenderSettings
    from nerf_tpu.render.engine import NerfRender

    cfg = {
        "encoding": {"otype": "HashGrid", "n_levels": 6,
                     "n_features_per_level": 2, "log2_hashmap_size": 12,
                     "base_resolution": 16, "per_level_scale": 1.5},
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

    stats = eng.convert_to_tpugrid(log2_rows=16)  # ample rows: few collisions
    assert stats["levels"], stats
    from nerf_tpu.encodings.tpugrid import TpuGridEncoding
    assert isinstance(eng.network.pos_encoding, TpuGridEncoding)
    rgb_c, _, w_c = eng.render_frame_arrays(cam, pose)
    # most pixels agree; collided fine-level bricks may shift a few
    diff = np.abs(np.asarray(rgb_c) - np.asarray(rgb_ref))
    assert np.isfinite(np.asarray(rgb_c)).all()
    assert np.median(diff) < 5e-3, np.median(diff)


def test_auto_sized_rows_from_occupancy():
    """recommend_log2_rows picks the smallest budget whose hashed levels
    fit the snapshot's occupied bricks (zero forced collisions), and the
    engine default (log2_rows=None) applies it: converting a sparse
    foreign snapshot with the DEFAULT config must then be collision-free
    on every level — the VERDICT r4 'use its own diagnosis' item."""
    from nerf_tpu.encodings.convert import (
        occupied_brick_counts,
        recommend_log2_rows,
    )

    tc = GridEncoding(3, CFG)
    h = 32
    dg = _sphere_grid(h, r0=0.4, r1=0.5)  # thin sparse shell
    counts = occupied_brick_counts(tc, dg, h, 1, 1.0, 0.01)
    assert len(counts) == 6
    L = recommend_log2_rows(counts, 27, 2)
    max_rows = 1 << L
    for d in counts:
        assert d["nb"] ** 3 <= max_rows or d["bricks"] * 2 <= max_rows

    # engine path: default conversion auto-sizes and is collision-free
    from nerf_tpu.core.snapshot import make_synthetic_snapshot
    from nerf_tpu.core.types import RenderSettings
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
    eng = NerfRender(settings=RenderSettings(density_scale=8.0))
    eng.load_from_snapshot(snap)
    stats = eng.convert_to_tpugrid()  # None -> auto
    assert "auto_log2_rows" in stats
    # the synthetic sphere occupancy is moderate; sized rows must leave
    # every level collision-free (rows >= occupied bricks per level)
    assert all(L_["max_bricks_per_row"] <= 1 for L_ in stats["levels"]), \
        stats["levels"]


def test_collision_fit_is_occupancy_weighted():
    """When two occupied bricks collide into one row, the fitted row is
    the weight-proportional mean (weights = occupancy-cell hit counts),
    not the plain mean: a barely-occupied alias must not dilute a
    heavily-sampled brick."""
    from nerf_tpu.encodings.convert import _occupied_bricks

    h = 32
    dg = _sphere_grid(h, r0=0.3, r1=0.6)
    bricks, wts = _occupied_bricks(dg, h, 1, 0.01, 1.0, scale=47.0,
                                   nb=24, brick_w=2)
    assert len(bricks) == len(wts)
    assert (wts >= 1).all()
    assert wts.max() > 1  # interior cells hit bricks repeatedly
