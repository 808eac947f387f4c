"""Native C++ snapshot codec vs the pure-Python msgpack path."""
import numpy as np
import pytest

import nerf_tpu.native as native
from nerf_tpu.core.snapshot import (
    load_snapshot,
    make_synthetic_snapshot,
    save_snapshot,
)
from tests.test_render import SMALL_CFG


@pytest.fixture(scope="module")
def codec():
    lib = native.load_codec()
    if lib is None:
        pytest.skip("native codec unavailable (no g++?)")
    return lib


def test_native_matches_python(codec, tmp_path):
    snap = make_synthetic_snapshot(seed=5, grid_h=16,
                                   network_config=SMALL_CFG)
    path = str(tmp_path / "s.msgpack")
    save_snapshot(path, snap.config, snap.params, snap.density_grid,
                  snap.settings)

    fast = load_snapshot(path)

    # force the pure-Python path
    orig = native.fast_scan_snapshot
    native.fast_scan_snapshot = lambda b: None
    try:
        slow = load_snapshot(path)
    finally:
        native.fast_scan_snapshot = orig

    np.testing.assert_allclose(fast.params, slow.params, rtol=1e-6)
    np.testing.assert_array_equal(fast.density_grid, slow.density_grid)
    assert fast.settings == slow.settings
    assert fast.config["encoding"] == slow.config["encoding"]


def test_native_scan_fields(codec, tmp_path):
    import msgpack

    data = msgpack.packb({
        "other": [1, 2, 3],
        "snapshot": {
            "aabb": [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0],
            "bound": 2.0, "scale": 0.33, "cascade": 2,
            "density_grid_size": 4, "mean_density": 0.01,
            "density_grid": [0.5] * 128, "params": [1.5] * 64,
            "extra": "ignored",
        },
    }, use_bin_type=True)
    fields, spliced = native.fast_scan_snapshot(data)
    assert fields["bound"] == 2.0
    assert fields["cascade"] == 2
    np.testing.assert_array_equal(fields["params"], np.full(64, 1.5))
    np.testing.assert_array_equal(fields["density_grid"], np.full(128, 0.5))
    np.testing.assert_array_equal(fields["aabb"], [-1, -1, -1, 1, 1, 1])
    # spliced remainder decodes and has the arrays emptied
    cfg = msgpack.unpackb(spliced, raw=False)
    assert cfg["snapshot"]["params"] == []
    assert cfg["snapshot"]["density_grid"] == []
    assert cfg["other"] == [1, 2, 3]
    assert cfg["snapshot"]["extra"] == "ignored"


def test_corrupt_data_returns_none(codec):
    assert native.fast_scan_snapshot(b"\x81\xa3foo") in (None,)
