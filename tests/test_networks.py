import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.networks.mlp import MLP, create_network, minimum_alignment


def test_param_layout_base_density():
    """Density net of the base config: 32->64(relu)->16.
    Matrices [64,32] + [16,64] (fully_fused_mlp.cu:662-681)."""
    mlp = MLP(input_width=32, output_width=16, width=64, n_hidden_layers=1)
    assert mlp.shapes == [(64, 32), (16, 64)]
    assert mlp.n_params == 64 * 32 + 16 * 64 == 3072


def test_param_layout_base_rgb():
    """RGB net: 32->64->64->3(pad16): [64,32],[64,64],[16,64] = 7168."""
    mlp = MLP(input_width=32, output_width=3, width=64, n_hidden_layers=2)
    assert mlp.padded_output_width == 16
    assert mlp.n_params == 7168


def test_forward_matches_manual():
    mlp = MLP(input_width=4, output_width=2, width=8, n_hidden_layers=1,
              activation="ReLU", output_activation="None")
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((8, 4)).astype(np.float32)
    w1 = rng.standard_normal((16, 8)).astype(np.float32)
    flat = np.concatenate([w0.ravel(), w1.ravel()])
    x = rng.standard_normal((5, 4)).astype(np.float32)
    out = np.asarray(mlp.apply(jnp.asarray(flat), jnp.asarray(x)))
    ref = np.maximum(x @ w0.T, 0) @ w1.T
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_flatten_roundtrip():
    mlp = MLP(input_width=4, output_width=2, width=8, n_hidden_layers=3)
    flat = mlp.init_params()
    mats = mlp.unflatten(flat)
    assert [m.shape for m in mats] == mlp.shapes
    np.testing.assert_array_equal(np.asarray(mlp.flatten(mats)),
                                  np.asarray(flat))


def test_create_network_and_alignment():
    cfg = {"otype": "FullyFusedMLP", "activation": "ReLU",
           "output_activation": "None", "n_neurons": 64,
           "n_hidden_layers": 2, "n_input_dims": 32, "n_output_dims": 3}
    net = create_network(cfg)
    assert net.width == 64 and net.padded_output_width == 16
    assert minimum_alignment(cfg) == 16
    assert minimum_alignment({"otype": "CutlassMLP"}) == 8
    with pytest.raises(ValueError):
        create_network({"otype": "Transformer", "n_input_dims": 4,
                        "n_output_dims": 4})


def test_output_activation():
    mlp = MLP(input_width=4, output_width=2, width=8, n_hidden_layers=1,
              activation="ReLU", output_activation="Sigmoid")
    out = np.asarray(mlp.apply(mlp.init_params(), jnp.ones((3, 4))))
    assert np.all((out > 0) & (out < 1))


def test_bf16_compute_close_to_fp32():
    mlp32 = MLP(input_width=32, output_width=16, width=64, n_hidden_layers=2)
    mlp16 = MLP(input_width=32, output_width=16, width=64, n_hidden_layers=2,
                compute_dtype=jnp.bfloat16)
    flat = mlp32.init_params()
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((16, 32)).astype(np.float32))
    a = np.asarray(mlp32.apply(flat, x), np.float32)
    b = np.asarray(mlp16.apply(flat, x), np.float32)
    assert np.max(np.abs(a - b)) < 0.15 * (np.abs(a).max() + 1)
