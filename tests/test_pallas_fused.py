"""Fused Pallas NeRF head vs the plain-JAX oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.core.snapshot import DEFAULT_NETWORK_CONFIG
from nerf_tpu.models.nerf import build_nerf_network
from nerf_tpu.ops.pallas.fused_network import fused_nerf_mlp


def _net():
    return build_nerf_network(DEFAULT_NETWORK_CONFIG, bound=1.0)


def test_fused_matches_oracle_interpret():
    net = _net()
    assert net.fused_supported
    params = net.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    b = 300  # deliberately not a multiple of the block
    pos = jnp.asarray(rng.uniform(0, 1, (3, b)).astype(np.float32))
    dirs = jnp.asarray(rng.uniform(0, 1, (3, b)).astype(np.float32))

    rgb_ref, sigma_ref = net.apply_cf(params, pos, dirs)
    rgb_f, sigma_f = net.apply_cf_fused(params, pos, dirs, interpret=True,
                                        block_b=128)
    # bf16 storage, fp32 accumulate: tolerances per precision plan
    rgb_ref = np.asarray(rgb_ref)
    scale = np.abs(rgb_ref).max() + 1.0
    assert np.max(np.abs(np.asarray(rgb_f) - rgb_ref)) < 0.03 * scale
    srel = np.abs(np.asarray(sigma_f) - np.asarray(sigma_ref)) \
        / (np.asarray(sigma_ref) + 1e-3)
    assert np.max(srel) < 0.1


def test_fused_raw_output_layout():
    """Row 3 of the kernel output must be the RAW density (pre-activation),
    rows 0..2 the raw rgb-net output (extract_density packing,
    nerf_network.h:187-195)."""
    net = _net()
    params = net.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(4)
    b = 64
    pos = jnp.asarray(rng.uniform(0, 1, (3, b)).astype(np.float32))
    dirs = jnp.asarray(rng.uniform(0, 1, (3, b)).astype(np.float32))

    h = net.pos_encoding.apply_cf(params["pos_encoding"], pos)
    d_mats = net.density_network.unflatten(params["density_mlp"])
    r_mats = net.rgb_network.unflatten(params["rgb_mlp"])
    out = fused_nerf_mlp(
        h, dirs, tuple(d_mats) + tuple(r_mats), n_density_mats=len(d_mats),
        sh_degree=4, rgb_input_width=net.rgb_network_input_width,
        block_b=64, compute_dtype=jnp.float32, interpret=True)
    assert out.shape == (8, b)

    raw = np.asarray(net.density_raw(params, pos.T))[:, 0]
    np.testing.assert_allclose(np.asarray(out[3]), raw, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out[4:]), 0.0)


def test_fused_fp32_exactness():
    """With fp32 compute the fused kernel must match the oracle tightly."""
    net = _net()
    params = net.init_params(jax.random.PRNGKey(2))
    rng = np.random.default_rng(5)
    b = 128
    pos = jnp.asarray(rng.uniform(0, 1, (3, b)).astype(np.float32))
    dirs = jnp.asarray(rng.uniform(0, 1, (3, b)).astype(np.float32))

    h = net.pos_encoding.apply_cf(params["pos_encoding"], pos)
    d_mats = net.density_network.unflatten(params["density_mlp"])
    r_mats = net.rgb_network.unflatten(params["rgb_mlp"])
    out = fused_nerf_mlp(
        h, dirs, tuple(d_mats) + tuple(r_mats), n_density_mats=len(d_mats),
        sh_degree=4, rgb_input_width=net.rgb_network_input_width,
        block_b=128, compute_dtype=jnp.float32, interpret=True)
    rgb_ref, sigma_ref = net.apply_cf(params, pos, dirs)
    np.testing.assert_allclose(np.asarray(out[:3]), np.asarray(rgb_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.exp(np.asarray(out[3])),
                               np.asarray(sigma_ref), rtol=1e-5)
