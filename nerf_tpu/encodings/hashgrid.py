"""Multiresolution grid encoding (Hash / Dense / Tiled).

Reference parity: tiny-cuda-nn `GridEncodingTemplated`
(dependencies/tiny-cuda-nn/include/tiny-cuda-nn/encodings/grid.h):
  - per-level scale  = exp2(l * log2(b)) * N_min - 1, resolution = ceil(scale)+1
    (grid.h:190-192, computed here in float32 to match `exp2f`)
  - offset table with 8-aligned params_in_level = min(next_mult(res^3, 8), 2^T)
    (grid.h:899-933)
  - stride-guarded dense indexing + `fast_hash` xor-of-primes fallback
    (grid.h:82-117)
  - pos_fract: pos = x*scale + 0.5, cell = floor(pos) (common_device.h:404-427)
  - N-linear interpolation over 2^D corners (grid.h:234-268)
  - SoA output, level-major feature order out[..., l*F + f] (grid.h:252-256)

TPU design: one flat parameter table [total_entries, F] in HBM; all levels
gathered in a single batched `take` per corner (8 static-unrolled corners),
interpolation fused by XLA on the VPU. A Pallas kernel with VMEM-resident
coarse levels lives in nerf_tpu/ops/pallas (drop-in, same params).
"""
from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.encodings.base import Encoding, next_multiple

# grid.h:90 — xor-folding primes (prime[0]=1 keeps x-coherence).
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437,
           2165219737)

_MAX_PARAMS = (1 << 31)


def _grid_type_from_otype(otype: str, cfg: Dict) -> str:
    o = otype.lower()
    if "type" in cfg:
        return str(cfg["type"]).capitalize()
    if o.startswith("hash"):
        return "Hash"
    if o.startswith("dense"):
        return "Dense"
    if o.startswith("tiled") or o.startswith("tile"):
        return "Tiled"
    return "Hash"


class GridEncoding(Encoding):
    def __init__(self, n_dims: int, config: Dict, alignment: int = 8):
        self.n_dims = int(n_dims)
        self.grid_type = _grid_type_from_otype(str(config.get("otype", "HashGrid")), config)
        self.n_features_per_level = int(config.get("n_features_per_level", 2))
        if config.get("n_features", 0):
            self.n_levels = int(config["n_features"]) // self.n_features_per_level
        else:
            self.n_levels = int(config.get("n_levels", 16))
        self.log2_hashmap_size = int(config.get("log2_hashmap_size", 19))
        self.base_resolution = int(config.get("base_resolution", 16))
        self.per_level_scale = float(config.get("per_level_scale", 2.0))
        self.interpolation = str(config.get("interpolation", "Linear"))
        self.quantize_threshold = float(config.get("quantize_threshold", 0.0))

        self.n_output_dims = self.n_levels * self.n_features_per_level
        self.alignment = max(1, int(alignment))

        if self.n_output_dims % self.n_features_per_level != 0:
            raise ValueError("n_features must be a multiple of n_features_per_level")

        # ---- static per-level tables (grid.h:899-933) --------------------
        log2b = np.float32(math.log2(self.per_level_scale))
        hashmap_size = 1 << self.log2_hashmap_size
        scales: List[float] = []
        resolutions: List[int] = []
        level_sizes: List[int] = []
        offsets: List[int] = []
        use_hash: List[bool] = []
        include_dim: List[List[bool]] = []
        offset = 0
        for lvl in range(self.n_levels):
            scale = float(np.exp2(np.float32(lvl) * log2b)
                          * np.float32(self.base_resolution) - np.float32(1.0))
            res = int(np.ceil(np.float32(scale))) + 1
            dense = res ** self.n_dims
            params_in_level = _MAX_PARAMS if float(res) ** self.n_dims > _MAX_PARAMS else dense
            params_in_level = next_multiple(params_in_level, 8)
            if self.grid_type == "Tiled":
                params_in_level = min(params_in_level,
                                      self.base_resolution ** self.n_dims)
            elif self.grid_type == "Hash":
                params_in_level = min(params_in_level, hashmap_size)
            # stride-guarded index loop (grid.h:100-117): dim d participates
            # in the dense index iff its stride <= this level's table size.
            inc = []
            stride = 1
            for _ in range(self.n_dims):
                inc.append(stride <= params_in_level)
                if stride > params_in_level:
                    break
                stride *= res
            while len(inc) < self.n_dims:
                inc.append(False)
            hashed = (self.grid_type == "Hash") and (params_in_level < stride)

            scales.append(scale)
            resolutions.append(res)
            level_sizes.append(params_in_level)
            offsets.append(offset)
            use_hash.append(hashed)
            include_dim.append(inc)
            offset += params_in_level

        self._scales = np.asarray(scales, np.float32)
        self._resolutions = np.asarray(resolutions, np.uint32)
        self._level_sizes = np.asarray(level_sizes, np.uint32)
        self._offsets = np.asarray(offsets, np.uint32)
        self._use_hash = np.asarray(use_hash, bool)
        self._include_dim = np.asarray(include_dim, bool)  # [L, D]
        self.total_entries = offset
        self._n_params = offset * self.n_features_per_level

    @property
    def n_params(self) -> int:
        return self._n_params

    def init_params(self, key=None):
        # tcnn grid init: uniform in [-1e-4, 1e-4] (grid.h initialize_params).
        if key is None:
            key = jax.random.PRNGKey(0)
        return jax.random.uniform(key, (self._n_params,), jnp.float32,
                                  -1e-4, 1e-4)

    # ------------------------------------------------------------------
    def _corner_rows(self, cell: jnp.ndarray, corner_bits: int) -> jnp.ndarray:
        """Flat table row for one interpolation corner, all levels at once.

        cell: uint32 [..., L, D]. Returns uint32 [..., L] global rows.
        """
        c = cell
        add = jnp.asarray(
            [(corner_bits >> d) & 1 for d in range(self.n_dims)], jnp.uint32)
        c = c + add  # [..., L, D]

        # dense index with static per-level dim participation
        res = jnp.asarray(self._resolutions)  # [L]
        strides = [jnp.ones_like(res)]
        for _ in range(self.n_dims - 1):
            strides.append(strides[-1] * res)
        idx_dense = jnp.zeros(c.shape[:-1], jnp.uint32)
        inc = jnp.asarray(self._include_dim)  # [L, D] bool
        for d in range(self.n_dims):
            idx_dense = idx_dense + jnp.where(inc[:, d], c[..., d] * strides[d], 0)

        # fast_hash (grid.h:82-98)
        idx_hash = jnp.zeros(c.shape[:-1], jnp.uint32)
        for d in range(self.n_dims):
            idx_hash = idx_hash ^ (c[..., d] * jnp.uint32(_PRIMES[d]))

        idx = jnp.where(jnp.asarray(self._use_hash), idx_hash, idx_dense)
        idx = idx % jnp.asarray(self._level_sizes)
        return idx + jnp.asarray(self._offsets)

    def encode(self, params, x):
        """x: [..., D] in [0, 1] -> [..., L*F]."""
        table = params.reshape(self.total_entries, self.n_features_per_level)
        xf = x.astype(jnp.float32)

        scales = jnp.asarray(self._scales)  # [L]
        pos = xf[..., None, :] * scales[:, None] + 0.5  # [..., L, D]
        cell_f = jnp.floor(pos)
        frac = pos - cell_f
        cell = cell_f.astype(jnp.uint32)

        interp = self.interpolation.lower()
        if interp == "nearest":
            # Nearest uses the floored cell directly (grid.h:218-233).
            rows = self._corner_rows(cell, 0)
            out = table[rows].astype(jnp.float32)  # [..., L, F]
        else:
            if interp == "smoothstep":
                frac = frac * frac * (3.0 - 2.0 * frac)
            acc = None
            for corner in range(1 << self.n_dims):
                rows = self._corner_rows(cell, corner)  # [..., L]
                vals = table[rows].astype(jnp.float32)  # [..., L, F]
                if self.quantize_threshold > 0.0:
                    vals = jnp.where(jnp.abs(vals) < self.quantize_threshold,
                                     0.0, vals)
                w = jnp.ones(frac.shape[:-1], jnp.float32)
                for d in range(self.n_dims):
                    fd = frac[..., d]
                    w = w * jnp.where((corner >> d) & 1, fd, 1.0 - fd)
                contrib = w[..., None] * vals
                acc = contrib if acc is None else acc + contrib
            out = acc

        # level-major SoA order: out[..., l*F + f] (grid.h:252-256)
        return out.reshape(out.shape[:-2] + (self.n_output_dims,)).astype(
            params.dtype)
