import numpy as np

from nerf_tpu.utils import sampling as smp


def test_pcg32_determinism_and_range():
    a = smp.PCG32(42)
    b = smp.PCG32(42)
    seq_a = [a.next_float() for _ in range(100)]
    seq_b = [b.next_float() for _ in range(100)]
    np.testing.assert_array_equal(seq_a, seq_b)
    assert all(0.0 <= v < 1.0 for v in seq_a)
    # different seeds diverge
    c = smp.PCG32(43)
    assert [c.next_float() for _ in range(4)] != seq_a[:4]


def test_pcg32_advance():
    a = smp.PCG32(7)
    for _ in range(10):
        a.next_uint()
    b = smp.PCG32(7)
    b.advance(10)
    assert a.next_uint() == b.next_uint()


def test_sobol_first_points():
    # dim 0 of Sobol is the van-der-Corput sequence: index 1 -> 0.5
    assert smp.sobol(1, 0) == 0x80000000
    assert smp.sobol(2, 0) == 0x40000000
    assert smp.sobol(3, 0) == 0xC0000000
    # vectorized
    np.testing.assert_array_equal(smp.sobol(np.arange(4), 1)[:2],
                                  [0, 0x80000000])


def test_scrambled_sobol_uniformity():
    pts = smp.ld_random_val_2d(np.arange(1024, dtype=np.uint32), 1234)
    assert pts.shape == (1024, 2)
    assert np.all((pts >= 0) & (pts < 1))
    # low-discrepancy: mean close to 0.5
    np.testing.assert_allclose(pts.mean(0), 0.5, atol=0.02)


def test_halton():
    np.testing.assert_allclose(smp.halton(np.asarray([1, 2, 3]), 2),
                               [0.5, 0.25, 0.75])
    np.testing.assert_allclose(smp.halton(np.asarray([1, 2, 3]), 3),
                               [1 / 3, 2 / 3, 1 / 9], rtol=1e-6)


def test_pixel_offset():
    o0 = smp.ld_random_pixel_offset(0)
    np.testing.assert_allclose(o0, 0.5)  # spp 0 cancels (render_buffer.cu:646)
    o1 = smp.ld_random_pixel_offset(1)
    assert np.all((o1 >= 0) & (o1 < 1))
    assert not np.allclose(o0, o1)


def test_direction_maps_roundtrip():
    rng = np.random.default_rng(0)
    p = rng.uniform(0.05, 0.95, (32, 2)).astype(np.float32)
    d = smp.cylindrical_to_dir(p)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-5)
    p2 = smp.dir_to_cylindrical(d)
    np.testing.assert_allclose(p2, p, atol=1e-5)
    sph = smp.dir_to_spherical_unorm(d)
    assert np.all((sph >= 0) & (sph <= 1))


def test_cosine_hemisphere_and_fibonacci():
    u = np.random.default_rng(1).uniform(0, 1, (64, 2)).astype(np.float32)
    d = smp.cosine_hemisphere(u)
    assert np.all(d[:, 2] >= 0)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    fd = smp.fibonacci_dir(np.arange(100), 100)
    np.testing.assert_allclose(np.linalg.norm(fd, axis=-1), 1.0, atol=1e-5)
