"""Bias-free MLPs and the network factory.

Reference parity: tcnn `FullyFusedMLP` / `CutlassMLP`
(dependencies/tiny-cuda-nn/src/fully_fused_mlp.cu:637-687,
src/network.cu:83-164):
  - weight matrices are row-major [out, in], concatenated flat in layer
    order: input [W, n_in], hidden [W, W] x (n_hidden-1), output
    [padded_out, W] where padded_out = next_multiple(out, 16)
  - no biases
  - hidden activation applied after every matmul except the last, which
    gets output_activation
  - `minimum_alignment` = 16 for fused types (src/network.cu:~minimum_alignment)

TPU design: the MLP is a chain of MXU matmuls; weights can be cast to
bfloat16 with fp32 accumulation (preferred_element_type) — the analog of
tcnn's __half wmma with fp32 accumulate. A fully-fused Pallas kernel with
the whole chain resident in VMEM lives in nerf_tpu/ops/pallas and consumes
the same flat parameter vector.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from nerf_tpu.encodings.base import next_multiple

TENSORCORE_WIDTH = 16

_FUSED_OTYPES = {"fullyfusedmlp", "megakernelmlp"}


def minimum_alignment(network_config: Dict) -> int:
    otype = str(network_config.get("otype", "MLP")).lower()
    return 16 if otype in _FUSED_OTYPES else 8


def activation_fn(name: str):
    """tcnn activation set (common.h Activation enum; nerf_network.h:33-47)."""
    n = (name or "None").lower()
    if n == "none":
        return lambda x: x
    if n == "relu":
        return jax.nn.relu
    if n == "exponential":
        return jnp.exp
    if n == "sigmoid":
        return jax.nn.sigmoid
    if n == "squareplus":
        # tcnn: 0.5 * (x + sqrt(x^2 + 4))
        return lambda x: 0.5 * (x + jnp.sqrt(x * x + 4.0))
    if n == "softplus":
        return jax.nn.softplus
    if n == "tanh":
        return jnp.tanh
    if n == "sine":
        return jnp.sin
    raise ValueError(f"Unsupported activation: {name}")


class MLP:
    def __init__(self, input_width: int, output_width: int, width: int,
                 n_hidden_layers: int, activation: str = "ReLU",
                 output_activation: str = "None",
                 compute_dtype=jnp.float32):
        if n_hidden_layers <= 0:
            raise ValueError("MLP requires at least 1 hidden layer")
        self.input_width = int(input_width)
        self.output_width = int(output_width)
        self.width = int(width)
        self.n_hidden_layers = int(n_hidden_layers)
        self.padded_output_width = next_multiple(self.output_width,
                                                 TENSORCORE_WIDTH)
        self.activation = activation
        self.output_activation = output_activation
        self.compute_dtype = compute_dtype

        # [out, in] shapes, in flat-concatenation order
        # (fully_fused_mlp.cu:662-681).
        self.shapes: List[tuple] = [(self.width, self.input_width)]
        for _ in range(self.n_hidden_layers - 1):
            self.shapes.append((self.width, self.width))
        self.shapes.append((self.padded_output_width, self.width))
        self.n_params = sum(o * i for o, i in self.shapes)

    def unflatten(self, flat) -> List[jnp.ndarray]:
        mats, off = [], 0
        for o, i in self.shapes:
            mats.append(flat[off:off + o * i].reshape(o, i))
            off += o * i
        return mats

    def flatten(self, mats: Sequence[jnp.ndarray]):
        return jnp.concatenate([m.reshape(-1) for m in mats])

    def init_params(self, key=None):
        # Xavier-uniform per matrix (tcnn initialize_params default).
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, len(self.shapes))
        mats = []
        for (o, i), k in zip(self.shapes, keys):
            scale = jnp.sqrt(6.0 / (o + i))
            mats.append(jax.random.uniform(k, (o, i), jnp.float32,
                                           -scale, scale))
        return self.flatten(mats)

    def apply(self, params, x):
        """x: [..., input_width] -> [..., padded_output_width]."""
        mats = self.unflatten(params) if not isinstance(params, (list, tuple)) \
            else list(params)
        act = activation_fn(self.activation)
        out_act = activation_fn(self.output_activation)
        h = x.astype(self.compute_dtype)
        for w in mats[:-1]:
            h = jnp.dot(h, w.T.astype(self.compute_dtype),
                        preferred_element_type=jnp.float32)
            h = act(h).astype(self.compute_dtype)
        h = jnp.dot(h, mats[-1].T.astype(self.compute_dtype),
                    preferred_element_type=jnp.float32)
        return out_act(h)

    def apply_cf(self, params, x_cf):
        """Channel-first: x_cf [input_width, B] -> [padded_out, B].

        The TPU-native layout — activations are [C, B] (batch on the lane
        dim, tcnn's CM-batch analog), weights [out, in] hit the MXU as
        W @ X with fp32 accumulation.
        """
        mats = self.unflatten(params) if not isinstance(params, (list, tuple)) \
            else list(params)
        act = activation_fn(self.activation)
        out_act = activation_fn(self.output_activation)
        h = x_cf.astype(self.compute_dtype)
        for w in mats[:-1]:
            h = jnp.dot(w.astype(self.compute_dtype), h,
                        preferred_element_type=jnp.float32)
            h = act(h).astype(self.compute_dtype)
        h = jnp.dot(mats[-1].astype(self.compute_dtype), h,
                    preferred_element_type=jnp.float32)
        return out_act(h)


def create_network(config: Dict, compute_dtype=jnp.float32) -> MLP:
    """Config-driven network construction (src/network.cu:83-164).

    All otypes (FullyFusedMLP / MegakernelMLP / CutlassMLP / MLP) map to the
    same dense-chain semantics; the fused Pallas execution path is selected
    at call sites, not here.
    """
    otype = str(config.get("otype", "MLP")).lower()
    if otype not in (_FUSED_OTYPES | {"mlp", "cutlassmlp", "cutlassresnet"}):
        raise ValueError(f"Unknown network otype: {config.get('otype')}")
    return MLP(
        input_width=int(config["n_input_dims"]),
        output_width=int(config["n_output_dims"]),
        width=int(config.get("n_neurons", 128)),
        n_hidden_layers=int(config.get("n_hidden_layers", 5)),
        activation=str(config.get("activation", "ReLU")),
        output_activation=str(config.get("output_activation", "None")),
        compute_dtype=compute_dtype,
    )
