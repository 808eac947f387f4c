"""Identity / Frequency / OneBlob / TriangleWave encodings.

Reference parity (all from dependencies/tiny-cuda-nn/include/tiny-cuda-nn/
encodings/):
  identity.h:55-67       y = x*scale + offset, pad 1.0
  frequency.h:76-93      per dim: sin(pi*x*2^k + (j%2)*pi/2), k=(j/2)%F; pad 1.0
  oneblob.h              quartic-kernel CDF differences over n_bins with
                         +-1 wrapped copies; pad 1.0
  triangle_wave.h        per dim/freq: triangle wave of x*2^k; pad 1.0
"""
from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp

from nerf_tpu.encodings.base import Encoding


class IdentityEncoding(Encoding):
    pad_value = 1.0  # identity.h:65

    def __init__(self, n_dims: int, config: Dict, alignment: int = 8):
        self.n_dims = int(n_dims)
        self.scale = float(config.get("scale", 1.0))
        self.offset = float(config.get("offset", 0.0))
        self.n_output_dims = self.n_dims
        self.alignment = max(1, int(alignment))

    def encode(self, params, x):
        return x * self.scale + self.offset


class FrequencyEncoding(Encoding):
    pad_value = 1.0  # frequency.h:73

    def __init__(self, n_dims: int, config: Dict, alignment: int = 8):
        self.n_dims = int(n_dims)
        self.n_frequencies = int(config.get("n_frequencies", 12))
        self.n_output_dims = self.n_dims * self.n_frequencies * 2
        self.alignment = max(1, int(alignment))

    def encode(self, params, x):
        # Output order per input dim: sin(pi x), cos(pi x), sin(2pi x), ...
        # (frequency.h:76-89).
        xf = x.astype(jnp.float32)
        outs = []
        for d in range(self.n_dims):
            for k in range(self.n_frequencies):
                arg = xf[..., d] * (2.0 ** k) * math.pi
                outs.append(jnp.sin(arg))
                outs.append(jnp.sin(arg + math.pi / 2.0))
        return jnp.stack(outs, axis=-1).astype(x.dtype)


def _quartic_cdf(x, inv_radius: float):
    """common_device.h:478-483."""
    u = x * inv_radius
    u2 = u * u
    u4 = u2 * u2
    return jnp.clip((15.0 / 16.0) * u * (1.0 - (2.0 / 3.0) * u2
                                         + (1.0 / 5.0) * u4) + 0.5, 0.0, 1.0)


class OneBlobEncoding(Encoding):
    pad_value = 1.0  # oneblob.h kernel_one_blob pad branch

    def __init__(self, n_dims: int, config: Dict, alignment: int = 8):
        self.n_dims = int(n_dims)
        self.n_bins = int(config.get("n_bins", 16))
        self.n_output_dims = self.n_dims * self.n_bins
        self.alignment = max(1, int(alignment))

    def encode(self, params, x):
        xf = x.astype(jnp.float32)
        n = self.n_bins
        # CDF at bin boundaries, including the +-1 wrapped copies
        # (oneblob.h kernel_one_blob_soa).
        bounds = jnp.arange(n + 1, dtype=jnp.float32) / n  # [n+1]
        d = bounds - xf[..., None]  # [..., D, n+1]
        cdf = (_quartic_cdf(d, n) + _quartic_cdf(d - 1.0, n)
               + _quartic_cdf(d + 1.0, n))
        out = cdf[..., 1:] - cdf[..., :-1]  # [..., D, n]
        return out.reshape(out.shape[:-2] + (self.n_output_dims,)).astype(x.dtype)


class TriangleWaveEncoding(Encoding):
    pad_value = 1.0

    def __init__(self, n_dims: int, config: Dict, alignment: int = 8):
        self.n_dims = int(n_dims)
        self.n_frequencies = int(config.get("n_frequencies", 12))
        self.n_output_dims = self.n_dims * self.n_frequencies
        self.alignment = max(1, int(alignment))

    def encode(self, params, x):
        # triangle_wave.h: per frequency k, y = |2*frac(x*2^(k-1) + 0.5) - 1|
        # style triangle; tcnn uses x*2^k scaled wave in [0,1].
        xf = x.astype(jnp.float32)
        outs = []
        for d in range(self.n_dims):
            for k in range(self.n_frequencies):
                sx = xf[..., d] * (2.0 ** k)
                frac = sx - jnp.floor(sx)
                outs.append(jnp.abs(frac * 2.0 - 1.0))
        return jnp.stack(outs, axis=-1).astype(x.dtype)
