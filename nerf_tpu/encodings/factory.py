"""Encoding factory.

Reference parity: `tcnn::create_encoding`
(dependencies/tiny-cuda-nn/src/encoding.cu:87-162) — otype-dispatched
registry with an alignment argument that sets the padded output width.
"""
from __future__ import annotations

from typing import Dict

from nerf_tpu.encodings.base import Encoding
from nerf_tpu.encodings.basic import (
    FrequencyEncoding,
    IdentityEncoding,
    OneBlobEncoding,
    TriangleWaveEncoding,
)
from nerf_tpu.encodings.composite import CompositeEncoding
from nerf_tpu.encodings.hashgrid import GridEncoding
from nerf_tpu.encodings.spherical import SphericalHarmonicsEncoding
from nerf_tpu.encodings.tpugrid import TpuGridEncoding

_REGISTRY = {}


def register_encoding(name: str, cls) -> None:
    _REGISTRY[name.lower()] = cls


for _name in ("Grid", "HashGrid", "DenseGrid", "TiledGrid"):
    register_encoding(_name, GridEncoding)
register_encoding("TpuGrid", TpuGridEncoding)
register_encoding("SphericalHarmonics", SphericalHarmonicsEncoding)
register_encoding("Identity", IdentityEncoding)
register_encoding("Linear", IdentityEncoding)
register_encoding("Frequency", FrequencyEncoding)
register_encoding("NeRF", FrequencyEncoding)
register_encoding("OneBlob", OneBlobEncoding)
register_encoding("TriangleWave", TriangleWaveEncoding)
register_encoding("Composite", CompositeEncoding)


def create_encoding(n_dims: int, config: Dict, alignment: int = 8) -> Encoding:
    otype = str(config.get("otype", "OneBlob"))
    cls = _REGISTRY.get(otype.lower())
    if cls is None:
        raise ValueError(f"Unknown encoding otype: {otype}")
    return cls(n_dims, config, alignment=alignment)
