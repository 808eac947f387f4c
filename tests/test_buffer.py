import jax.numpy as jnp
import numpy as np

from nerf_tpu.buffer.render_buffer import (
    RenderBuffer,
    accumulate,
    colormap_turbo,
    colormap_viridis,
)
from nerf_tpu.buffer.tonemap import linear_to_srgb, srgb_to_linear, tonemap
from nerf_tpu.buffer.upsampler import (
    BilinearUpsampler,
    LearnedUpsampler,
    create_upsampler,
)


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(np.asarray(srgb_to_linear(linear_to_srgb(x))),
                               np.asarray(x), atol=2e-3)
    # piecewise knee values (common_device.cuh:38-54)
    np.testing.assert_allclose(float(srgb_to_linear(jnp.float32(0.04))),
                               0.04 / 12.92, rtol=1e-6)
    np.testing.assert_allclose(float(linear_to_srgb(jnp.float32(0.001))),
                               12.92 * 0.001, rtol=1e-6)


def test_tonemap_curves():
    x = jnp.asarray([[0.0, 0.5, 4.0]])
    ident = tonemap(x, curve="Identity")
    np.testing.assert_array_equal(np.asarray(ident), np.asarray(x))
    for curve in ("ACES", "Hable", "Reinhard"):
        y = np.asarray(tonemap(x, curve=curve))
        assert np.all(np.isfinite(y)), curve
        assert np.all(y >= 0), curve
        # curves compress highlights (Reinhard divides by luminance+1,
        # per-channel values stay below the input)
        assert np.all(y <= np.asarray(x) + 1e-5), curve
    # exposure doubles linear input before the curve
    y1 = np.asarray(tonemap(jnp.asarray([0.25, 0.25, 0.25]), exposure=1.0))
    np.testing.assert_allclose(y1, 0.5, rtol=1e-6)


def test_accumulate_spp_average():
    f1 = jnp.full((4, 4, 4), 1.0)
    f2 = jnp.full((4, 4, 4), 0.0)
    acc = jnp.zeros((4, 4, 4))
    acc = accumulate(f1, acc, 0)
    acc = accumulate(f2, acc, 1)
    np.testing.assert_allclose(np.asarray(acc), 0.5)


def test_render_buffer_pipeline():
    buf = RenderBuffer((8, 8), tonemap_curve="ACES",
                       output_color_space="SRGB")
    frame = jnp.concatenate([jnp.full((8, 8, 3), 0.5),
                             jnp.ones((8, 8, 1))], -1)
    buf.accumulate_frame(frame)
    assert buf.spp == 1
    surf = np.asarray(buf.tonemap_to_surface(
        background_color=(1.0, 1.0, 1.0, 1.0), clamp_output_color=True))
    assert surf.shape == (8, 8, 4)
    assert np.all((surf >= 0) & (surf <= 1))
    buf.overlay_depth(jnp.full((8, 8), 0.5), alpha=0.5)
    buf.overlay_false_color(jnp.full((8, 8), 0.1), average=0.1)
    buf.clear_frame()
    assert buf.spp == 0
    np.testing.assert_array_equal(np.asarray(buf.accum), 0.0)


def test_colormaps_range():
    x = jnp.linspace(0.0, 1.0, 32)
    for cm in (colormap_turbo, colormap_viridis):
        c = np.asarray(cm(x))
        assert c.shape == (32, 3)
        assert np.all(c > -0.1) and np.all(c < 1.2)


def test_upsampler_interface():
    ups = create_upsampler((16, 16), quality="MaxPerformance")
    assert ups.out_resolution() == (16, 16)
    assert ups.quality() == "MaxPerformance"
    # clamp_resolution keeps inputs within [out/3, out] (dlss.cu:969-988)
    assert ups.clamp_resolution((100, 100)) == (16, 16)
    assert ups.clamp_resolution((2, 2)) == (5, 5)
    out = ups.run(jnp.ones((8, 8, 3)))
    assert out.shape == (16, 16, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_learned_upsampler():
    ups = LearnedUpsampler((8, 8))
    ups.params = ups.init_params()
    out = ups.run(jnp.ones((4, 4, 3)) * 0.5)
    assert out.shape == (8, 8, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # without params it degrades to bilinear
    base = BilinearUpsampler((8, 8)).run(jnp.ones((4, 4, 3)) * 0.5)
    ups.params = None
    np.testing.assert_allclose(np.asarray(ups.run(jnp.ones((4, 4, 3)) * 0.5)),
                               np.asarray(base))


def test_learned_upsampler_training_beats_bilinear():
    """The quality contract of the DLSS replacement (SURVEY.md section 7
    hard-part 5): after self-supervised training, the learned upsampler
    must beat plain bilinear on held-out images."""
    import jax

    from nerf_tpu.buffer.upsampler import (
        BilinearUpsampler,
        LearnedUpsampler,
        load_upsampler_params,
        save_upsampler_params,
        train_upsampler,
    )

    # synthetic "renders" with SHARED structure (oriented gratings):
    # bilinear attenuates high frequencies systematically, so a learned
    # sharpening residual generalizes across the family
    import math

    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    pairs = []
    rng = np.random.default_rng(0)
    for i in range(10):
        th = rng.uniform(0, math.pi)
        ph = rng.uniform(0, 2 * math.pi)
        f = rng.uniform(0.5, 0.9)
        img = 0.5 + 0.5 * np.sin(f * (np.cos(th) * xx + np.sin(th) * yy)
                                 + ph)
        hi = jnp.asarray(np.stack([img, img * 0.8, img * 0.6], -1),
                         jnp.float32)
        lo = jax.image.resize(hi, (16, 16, 3), "bilinear")
        pairs.append((lo, hi))
    train, test = pairs[:8], pairs[8:]

    params, losses = train_upsampler(train, steps=300, lr=3e-3)
    assert losses[-1] < losses[0]

    def mse(up, lo, hi):
        return float(jnp.mean((up.run(lo) - hi) ** 2))

    bil = BilinearUpsampler((32, 32))
    learned = LearnedUpsampler((32, 32), params=params)
    bil_mse = np.mean([mse(bil, lo, hi) for lo, hi in test])
    l_mse = np.mean([mse(learned, lo, hi) for lo, hi in test])
    assert l_mse < bil_mse, (l_mse, bil_mse)

    # params round-trip
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "up.npz")
        save_upsampler_params(p, params)
        loaded = load_upsampler_params(p)
        l2 = LearnedUpsampler((32, 32), params=loaded)
        np.testing.assert_allclose(np.asarray(l2.run(test[0][0])),
                                   np.asarray(learned.run(test[0][0])),
                                   rtol=1e-6, atol=1e-6)
