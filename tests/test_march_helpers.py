"""Unit tests for the march's static-shape helper math (bucket ladders,
skip-trip bound, wave-count concat) — the pieces future refactors are
most likely to silently regress."""
import jax.numpy as jnp
import numpy as np

from nerf_tpu.core.types import MIN_STEPSIZE, RenderSettings
from nerf_tpu.render.march import (
    _bucket_sizes,
    _concat_counts,
    _ray_buckets,
    _skip_trip_bound,
)


def test_ray_buckets_default_ladder():
    assert _ray_buckets(65536) == [65536, 16384, 4096]
    assert _ray_buckets(100) == [100]          # below the floor
    assert _ray_buckets(65536, (64, 16)) == [64, 16]
    # allowed entries above chunk clamp to chunk
    assert _ray_buckets(256, (1024, 64)) == [256, 64]


def test_bucket_sizes_monotone_and_capped():
    sizes = _bucket_sizes(1 << 20)
    assert sizes == sorted(sizes)
    assert sizes[-1] == 1 << 20
    # restricted set
    assert _bucket_sizes(2048, (1024, 4096)) == [1024, 2048]
    # ns smaller than every allowed bucket -> just ns
    assert _bucket_sizes(512, (1024,)) == [512]


def test_skip_trip_bound_covers_voxel_diagonal():
    s = RenderSettings()  # bound 1, grid 128
    u = _skip_trip_bound(s)
    diag = np.sqrt(3.0) * 2.0 * s.bound / s.grid_h * (s.grid_h
                                                      / (s.grid_h - 1))
    # u steps of at least dt_min must cover the (inflated) diagonal
    assert u * MIN_STEPSIZE >= diag
    # and the user cap still applies
    s2 = RenderSettings(skip_iters=3)
    assert _skip_trip_bound(s2) == 3


def test_concat_counts_orders_chunks():
    a = jnp.asarray([1, 2], jnp.int32)
    b = jnp.asarray([3, 4], jnp.int32)
    pad = jnp.zeros((2,), jnp.int32)
    out = np.asarray(_concat_counts((a, b, pad)))
    np.testing.assert_array_equal(out, [1, 2, 3, 4, 0, 0])
