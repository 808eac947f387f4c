"""Prepared inference params: the packed gather tables must be built once
by prepare_params and produce bit-identical encodings to the in-trace
packing path (ADVICE r2 — the rebuild used to run inside every round
program)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.encodings.hashgrid import GridEncoding
from nerf_tpu.encodings.tpugrid import TpuGridEncoding
from nerf_tpu.models.nerf import build_nerf_network


def _x(n=257, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (3, n), jnp.float32)


def test_tpugrid_prepared_matches_inline():
    enc = TpuGridEncoding(3, {"n_levels": 4, "n_features_per_level": 2,
                              "log2_rows": 8, "base_resolution": 16,
                              "packed_gather": True})
    params = enc.init_params(jax.random.PRNGKey(1))
    x = _x()
    inline = enc.apply_cf(params, x)
    prep = enc.prepare_params(params)
    assert isinstance(prep, dict) and "ptable" in prep
    prepared = enc.apply_cf(prep, x)
    np.testing.assert_array_equal(np.asarray(inline), np.asarray(prepared))


def test_tpugrid_prepare_identity_when_unpacked():
    enc = TpuGridEncoding(3, {"n_levels": 2, "n_features_per_level": 2,
                              "log2_rows": 6, "packed_gather": False})
    params = enc.init_params()
    assert enc.prepare_params(params) is params


def test_hashgrid_prepared_matches_inline():
    enc = GridEncoding(3, {"otype": "HashGrid", "n_levels": 4,
                           "n_features_per_level": 2,
                           "log2_hashmap_size": 12, "base_resolution": 16,
                           "packed_gather": True})
    params = enc.init_params(jax.random.PRNGKey(2))
    x = _x(seed=3)
    inline = enc.apply_cf(params, x)
    prep = enc.prepare_params(params)
    prepared = enc.apply_cf(prep, x)
    np.testing.assert_array_equal(np.asarray(inline), np.asarray(prepared))


def test_network_prepare_params_forward():
    cfg = {
        "encoding": {"otype": "TpuGrid", "n_levels": 4,
                     "n_features_per_level": 2, "log2_rows": 8,
                     "base_resolution": 16, "packed_gather": True},
        "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": 64,
                    "n_hidden_layers": 1},
        "dir_encoding": {"otype": "SphericalHarmonics", "degree": 4},
        "rgb_network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                        "output_activation": "None", "n_neurons": 64,
                        "n_hidden_layers": 2},
    }
    net = build_nerf_network(cfg, bound=1.0)
    params = net.init_params()
    pos = _x(seed=4)
    d = jax.random.normal(jax.random.PRNGKey(5), (3, 257), jnp.float32)
    dir01 = d / jnp.linalg.norm(d, axis=0, keepdims=True) * 0.5 + 0.5
    rgb_r, sig_r = net.apply_cf(params, pos, dir01)
    prep = net.prepare_params(params)
    rgb_p, sig_p = net.apply_cf(prep, pos, dir01)
    np.testing.assert_array_equal(np.asarray(rgb_r), np.asarray(rgb_p))
    np.testing.assert_array_equal(np.asarray(sig_r), np.asarray(sig_p))
