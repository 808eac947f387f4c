import numpy as np

from nerf_tpu.core.snapshot import (
    load_snapshot,
    make_synthetic_snapshot,
    save_snapshot,
)
from nerf_tpu.models.nerf import build_nerf_network

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


def test_synthetic_snapshot_param_count():
    snap = make_synthetic_snapshot(grid_h=32, network_config=SMALL_CFG)
    net = build_nerf_network(snap.config, bound=snap.settings.bound)
    assert snap.params.size == net.n_params
    assert snap.density_grid.size == 32 ** 3


def test_roundtrip_msgpack(tmp_path):
    snap = make_synthetic_snapshot(grid_h=16, network_config=SMALL_CFG)
    path = str(tmp_path / "snap.msgpack")
    save_snapshot(path, snap.config, snap.params, snap.density_grid,
                  snap.settings)
    loaded = load_snapshot(path)
    np.testing.assert_allclose(loaded.params, snap.params, rtol=1e-6)
    np.testing.assert_array_equal(loaded.density_grid, snap.density_grid)
    assert loaded.settings.bound == snap.settings.bound
    assert loaded.settings.grid_h == 16
    assert loaded.settings.cascade == snap.settings.cascade
    assert loaded.settings.aabb == snap.settings.aabb


def test_density_grid_probe_indices():
    """Mirror of the reference's load-time probes at [66,66,66..68]
    (nerf_render.cu:454-465), scaled to the test grid."""
    snap = make_synthetic_snapshot(grid_h=128)
    h = 128
    probes = snap.density_grid[66 * h * h + 66 * h + 66:
                               66 * h * h + 66 * h + 69]
    # (66,66,66) maps to ~(0.04, 0.04, 0.04) — inside the r<0.5 sphere
    np.testing.assert_array_equal(probes, 1.0)
    # a corner voxel is empty
    assert snap.density_grid[0] == 0.0


def test_missing_snapshot_key():
    import pytest

    with pytest.raises(ValueError):
        load_snapshot({"encoding": {}})


def test_foreign_snapshot_layout(tmp_path):
    """Loader accepts externally-produced msgpack layouts (the reference
    reads element-wise through nlohmann json, src/nerf_render.cu:431-473,
    so foreign files legally contain float64 scalars, int-typed zeros,
    arbitrary map order, and unknown extra keys). Our own writer is
    byte-regular (f32 records) — this fixture deliberately is not."""
    import msgpack

    from nerf_tpu.models.nerf import build_nerf_network

    net = build_nerf_network(SMALL_CFG, bound=2.0)
    rng = np.random.default_rng(11)
    params = rng.standard_normal(net.n_params).astype(np.float32)
    h = 16
    grid = rng.random(h ** 3).astype(np.float32)

    # mixed element types: float64 for most, exact-int zeros sprinkled in
    grid_list = [float(v) for v in grid]
    grid_list[7] = 0
    grid[7] = 0.0
    params_list = [float(v) for v in params]
    params_list[0] = 1
    params[0] = 1.0

    foreign = {
        # extra top-level keys foreign producers include
        "encoding": SMALL_CFG["encoding"],
        "network": SMALL_CFG["network"],
        "dir_encoding": SMALL_CFG["dir_encoding"],
        "rgb_network": SMALL_CFG["rgb_network"],
        "snapshot": {
            # deliberately shuffled key order + unknown keys
            "density_grid": grid_list,
            "params": params_list,
            "snapshot_version": 1,
            "mean_density": 0.25,        # float64 on the wire
            "density_grid_size": h,
            "nerf": {"dataset": {"unused": True}},
            "cascade": 1,
            "bound": 2.0,
            "scale": 0.33,
            "aabb": [-2, -2, -2, 2, 2, 2],  # int-typed aabb
        },
    }
    path = str(tmp_path / "foreign.msgpack")
    with open(path, "wb") as f:
        f.write(msgpack.packb(foreign, use_bin_type=True))

    snap = load_snapshot(path)
    np.testing.assert_allclose(snap.params, params, rtol=1e-6)
    np.testing.assert_allclose(snap.density_grid, grid, rtol=1e-6)
    assert snap.settings.bound == 2.0
    assert snap.settings.grid_h == h
    assert snap.settings.mean_density == 0.25
    assert snap.settings.aabb == (-2.0, -2.0, -2.0, 2.0, 2.0, 2.0)

    # and the engine consumes it end-to-end
    from nerf_tpu.render.engine import NerfRender

    eng = NerfRender()
    eng.reload_network_from_file(path)
    assert eng.params is not None
