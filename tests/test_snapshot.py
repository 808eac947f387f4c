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
