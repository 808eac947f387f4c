"""Encoding interface.

Reference parity: the virtual `tcnn::Encoding<T>` surface (padded output
width, alignment-driven zero/one padding, flat parameter blob) from
tiny-cuda-nn (dependencies/tiny-cuda-nn/include/tiny-cuda-nn/encoding.h),
rebuilt as stateless config objects whose `apply` is a pure, jit-traceable
function `params, x[..., n_dims] -> y[..., padded_output_dim]`.

Parameters are flat fp32 vectors so a whole model packs into one flat
array matching the reference snapshot layout (nerf_network.h:273-291).
"""
from __future__ import annotations

import jax.numpy as jnp


def next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Encoding:
    """Base class: parameter-free, zero-padded encoding."""

    # Subclasses set these in __init__.
    n_dims: int
    n_output_dims: int
    alignment: int = 1
    pad_value: float = 0.0  # tcnn pads most encodings with 0; some with 1

    def set_alignment(self, alignment: int) -> None:
        self.alignment = max(1, int(alignment))

    @property
    def padded_output_dim(self) -> int:
        return next_multiple(self.n_output_dims, self.alignment)

    @property
    def n_to_pad(self) -> int:
        return self.padded_output_dim - self.n_output_dims

    @property
    def n_params(self) -> int:
        return 0

    def init_params(self, key=None):
        return jnp.zeros((0,), jnp.float32)

    def prepare_params(self, params):
        """Precompute the inference-time parameter form.

        Grid encodings override this to build their packed gather tables
        ONCE per parameter update instead of inside every traced encode
        (the round programs would otherwise re-pack tens of MB of HBM per
        dispatch — ADVICE r2). apply/apply_cf accept either the raw flat
        vector or the prepared form. Default: identity.
        """
        return params

    # -- subclass API -----------------------------------------------------
    def encode(self, params, x):
        """Return the unpadded [..., n_output_dims] encoding."""
        raise NotImplementedError

    def apply(self, params, x):
        """Encode and pad to padded_output_dim (padding appended last)."""
        y = self.encode(params, x)
        if self.n_to_pad:
            pad = jnp.full(y.shape[:-1] + (self.n_to_pad,), self.pad_value,
                           dtype=y.dtype)
            y = jnp.concatenate([y, pad], axis=-1)
        return y

    # -- channel-first (feature-major) path --------------------------------
    # TPU-native layout: the batch axis is minor-most so [C, B] arrays tile
    # onto (sublane, lane) without padding — the analog of tcnn's SoA "RM"
    # matrices (matrix_layout.h:37-47). Hot encodings override _encode_cf;
    # the default transposes through the channels-last implementation.
    def _encode_cf(self, params, x_cf):
        return self.encode(params, x_cf.T).T

    def apply_cf(self, params, x_cf):
        """x_cf: [n_dims, B] -> [padded_output_dim, B]."""
        y = self._encode_cf(params, x_cf)
        if self.n_to_pad:
            pad = jnp.full((self.n_to_pad,) + y.shape[1:], self.pad_value,
                           dtype=y.dtype)
            y = jnp.concatenate([y, pad], axis=0)
        return y
