import numpy as np

from nerf_tpu.utils.morton import (
    density_grid_to_bitfield,
    expand_bits,
    linear_to_morton_grid,
    morton3d,
    morton3d_invert,
)


def test_expand_bits_known():
    # 0b111 -> 0b1001001 (render_utils.h:163-169)
    assert expand_bits(np.uint32(0b111)) == 0b1001001
    assert expand_bits(np.uint32(1)) == 1


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1024, 256).astype(np.uint32)
    y = rng.integers(0, 1024, 256).astype(np.uint32)
    z = rng.integers(0, 1024, 256).astype(np.uint32)
    code = morton3d(x, y, z)
    xi, yi, zi = morton3d_invert(code)
    np.testing.assert_array_equal(xi, x)
    np.testing.assert_array_equal(yi, y)
    np.testing.assert_array_equal(zi, z)


def test_morton_order_locality():
    # morton code of (1,0,0) is 1, (0,1,0) is 2, (0,0,1) is 4
    assert morton3d(1, 0, 0) == 1
    assert morton3d(0, 1, 0) == 2
    assert morton3d(0, 0, 1) == 4
    assert morton3d(1, 1, 1) == 7


def test_grid_to_bitfield():
    h = 8
    grid = np.zeros(h ** 3, np.float32)
    grid[0] = 1.0  # voxel (0,0,0) -> morton 0 -> bit 0 of byte 0
    bf = density_grid_to_bitfield(grid, 0.5, h)
    assert bf.shape == (h ** 3 // 8,)
    assert bf[0] & 1 == 1
    assert bf[1:].sum() == 0
    # reorder matches morton indexing
    m = linear_to_morton_grid(grid, h)
    assert m[morton3d(0, 0, 0)] == 1.0
