import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.core.snapshot import DEFAULT_NETWORK_CONFIG
from nerf_tpu.models.nerf import build_nerf_network


def _net():
    return build_nerf_network(DEFAULT_NETWORK_CONFIG, bound=1.0)


def test_widths_match_reference():
    net = _net()
    # pos encoding: 16 levels x 2 features, aligned 16 -> 32
    assert net.pos_encoding.padded_output_dim == 32
    # dir encoding: SH deg4 composite, aligned 16 -> 16
    assert net.dir_encoding.padded_output_dim == 16
    # rgb input = next_mult(16+16, 16) = 32 (nerf_network.h:127-130)
    assert net.rgb_network_input_width == 32
    assert net.input_width == 6
    assert net.padded_output_width == 16
    assert net.output_width == 4


def test_param_count_and_order():
    net = _net()
    # density 3072 + rgb 7168 + grid params + SH 0
    assert net.density_network.n_params == 3072
    assert net.rgb_network.n_params == 7168
    assert net.dir_encoding.n_params == 0
    assert net.n_params == (3072 + 7168 + net.pos_encoding.n_params)

    flat = jnp.arange(net.n_params, dtype=jnp.float32)
    tree = net.unpack_params(flat)
    # slicing order density | rgb | pos | dir (nerf_network.h:273-291)
    assert float(tree["density_mlp"][0]) == 0.0
    assert float(tree["rgb_mlp"][0]) == 3072.0
    assert float(tree["pos_encoding"][0]) == 3072.0 + 7168.0
    np.testing.assert_array_equal(np.asarray(net.pack_params(tree)),
                                  np.asarray(flat))


def test_constant_input_probes():
    """Mirrors NerfNetwork::test() (nerf_network.h:445-553): constant-input
    inference through each stage with constant 1/32 params
    (initialize_xavier_uniform, nerf_network.h:322-336)."""
    net = _net()
    n_params = net.n_params
    flat = jnp.full((n_params,), 1.0 / 32.0, jnp.float32)
    params = net.unpack_params(flat)

    # density net on constant-0.1 encoded input: h0 = relu(sum(0.1/32 * 32))
    # = 0.1 (64 neurons); out = sum(0.1/32 * 64) = 0.2 for all 16 outputs.
    h = jnp.full((4, 32), 0.1, jnp.float32)
    d = np.asarray(net.density_network.apply(params["density_mlp"], h))
    np.testing.assert_allclose(d, 0.2, rtol=1e-5)

    # rgb net (2 hidden): 0.1 -> 0.1 -> 0.2 -> 0.4
    r = np.asarray(net.rgb_network.apply(params["rgb_mlp"],
                                         jnp.full((4, 32), 0.1)))
    np.testing.assert_allclose(r, 0.4, rtol=1e-5)

    # pos encoding with constant table 1/32: interpolation of a constant
    # table is the constant.
    p = np.asarray(net.pos_encoding.apply(params["pos_encoding"],
                                          jnp.full((4, 3), (0.1 + 1) / 2)))
    np.testing.assert_allclose(p, 1.0 / 32.0, rtol=1e-5)


def test_full_forward_shapes_and_sigma_activation():
    net = _net()
    params = net.init_params(jax.random.PRNGKey(0))
    pos = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (8, 3))
                      .astype(np.float32))
    dirs = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (8, 3))
                       .astype(np.float32))
    rgb, sigma = net.apply(params, pos, dirs)
    assert rgb.shape == (8, 3) and sigma.shape == (8,)
    # sigma = exp(density row 0) (nerf_network.h:125,187-195)
    raw = np.asarray(net.density_raw(params, pos))[..., 0]
    np.testing.assert_allclose(np.asarray(sigma), np.exp(raw), rtol=1e-5)
    # packed entry: x[...,6] -> rgbd[...,4]
    x = jnp.concatenate([pos, dirs], axis=-1)
    rgbd = net.apply_packed(params, x)
    np.testing.assert_allclose(np.asarray(rgbd[..., :3]), np.asarray(rgb),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rgbd[..., 3]), np.asarray(sigma),
                               rtol=1e-6)


def test_channel_first_matches_channels_last():
    """apply_cf (the hot-path SoA layout) must equal apply exactly."""
    net = _net()
    params = net.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.uniform(0, 1, (33, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.uniform(0, 1, (33, 3)).astype(np.float32))
    rgb, sigma = net.apply(params, pos, dirs)
    rgb_cf, sigma_cf = net.apply_cf(params, pos.T, dirs.T)
    np.testing.assert_allclose(np.asarray(rgb_cf.T), np.asarray(rgb),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sigma_cf), np.asarray(sigma),
                               rtol=1e-6, atol=1e-6)


def test_leading_batch_dims():
    net = _net()
    params = net.init_params()
    rgb, sigma = net.apply(params, jnp.full((2, 5, 3), 0.4),
                           jnp.full((2, 5, 3), 0.6))
    assert rgb.shape == (2, 5, 3) and sigma.shape == (2, 5)


def test_initialize_constant_and_hyperparams():
    net = _net()
    params = net.initialize_constant()
    np.testing.assert_allclose(np.asarray(params["density_mlp"]), 1 / 32)
    hp = net.hyperparams()
    assert hp["otype"] == "NerfNetwork"
    assert hp["density_network"]["n_output_dims"] == 16
