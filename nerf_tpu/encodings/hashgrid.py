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
interpolation fused by XLA on the VPU. The gathers are the measured system
bottleneck on v5e (BASELINE.md roofline); layout experiments (packed bf16
pairs, per-level tables, wide-slice gathers) live in bench_gather.py.
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
        # bf16 table entries packed in pairs into one uint32 per gather —
        # halves random HBM access streams; matches the reference's
        # half-precision tables (tcnn common.h:70). F==2 only.
        self.packed_gather = bool(config.get("packed_gather", False))

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

        # Static per-level strategy for `idx % level_size` — integer modulo
        # by a runtime vector lowers to a slow division loop on the VPU
        # (measured 2.5 s/encode at 512k samples); replace with:
        #   pow2 sizes  -> AND mask
        #   dense/hash  -> single conditional subtract (idx < 2*size holds:
        #                  dense idx <= res+res^2+res^3 < 2*size; hashed idx
        #                  is only reached when size is the pow2 hashmap cap)
        #   otherwise   -> true modulo (Tiled fine levels)
        pow2 = [(sz & (sz - 1)) == 0 for sz in level_sizes]
        # subtract is exact iff the level is uncapped dense (size >= res^D,
        # so any corner index < 2*size); hashed levels are always the pow2
        # hashmap cap; anything else (capped Tiled) needs a true modulo
        uncapped = [sz >= res ** self.n_dims
                    for sz, res in zip(level_sizes, resolutions)]
        self._and_mask = np.asarray(
            [sz - 1 if p else 0xFFFFFFFF
             for sz, p in zip(level_sizes, pow2)], np.uint32)
        self._needs_sub = [(not p) and u for p, u in zip(pow2, uncapped)]
        self._sub_mask = np.asarray(
            [sz if s else 0 for sz, s in zip(level_sizes, self._needs_sub)],
            np.uint32)
        self._needs_mod = any(
            (not p) and not s for p, s in zip(pow2, self._needs_sub))

    @property
    def n_params(self) -> int:
        return self._n_params

    def init_params(self, key=None):
        # tcnn grid init: uniform in [-1e-4, 1e-4] (grid.h initialize_params).
        if key is None:
            key = jax.random.PRNGKey(0)
        return jax.random.uniform(key, (self._n_params,), jnp.float32,
                                  -1e-4, 1e-4)

    def prepare_params(self, params):
        """Precompute the packed uint32 table once per parameter update
        (ADVICE r2: the in-trace rebuild cost HBM writes every dispatch).
        Returns {"ptable": [total_entries] uint32} in packed mode."""
        if self.packed_gather and self.n_features_per_level == 2:
            return {"ptable": self._pack_table(params)}
        return params

    def _pack_table(self, params):
        table = params.reshape(self.total_entries, 2)
        b0 = jax.lax.bitcast_convert_type(
            table[:, 0].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        b1 = jax.lax.bitcast_convert_type(
            table[:, 1].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        return b0 | (b1 << jnp.uint32(16))

    # ------------------------------------------------------------------
    def _corner_rows_cf(self, cell: jnp.ndarray,
                        corner_bits: int) -> jnp.ndarray:
        """Flat table row for one interpolation corner, all levels at once.

        cell: uint32 [D, L, B]. Returns uint32 [L, B] global rows.
        Channel-first so [L, B] tiles cleanly (batch on the lane dim).
        """
        add = [(corner_bits >> d) & 1 for d in range(self.n_dims)]

        # dense index with static per-level dim participation
        res = jnp.asarray(self._resolutions)  # [L]
        strides = [jnp.ones_like(res)]
        for _ in range(self.n_dims - 1):
            strides.append(strides[-1] * res)
        inc = jnp.asarray(self._include_dim)  # [L, D] bool
        idx_dense = jnp.zeros(cell.shape[1:], jnp.uint32)
        idx_hash = jnp.zeros(cell.shape[1:], jnp.uint32)
        for d in range(self.n_dims):
            c = cell[d] + jnp.uint32(add[d])  # [L, B]
            idx_dense = idx_dense + jnp.where(inc[:, d, None],
                                              c * strides[d][:, None], 0)
            # fast_hash (grid.h:82-98)
            idx_hash = idx_hash ^ (c * jnp.uint32(_PRIMES[d]))

        idx = jnp.where(jnp.asarray(self._use_hash)[:, None], idx_hash,
                        idx_dense)
        # static per-level reduction strategy (see ctor): AND for pow2,
        # conditional subtract for dense, true mod only when required
        idx = idx & jnp.asarray(self._and_mask)[:, None]
        if any(self._needs_sub):
            sub = jnp.asarray(self._sub_mask)[:, None]
            idx = jnp.where((sub > 0) & (idx >= sub), idx - sub, idx)
        if self._needs_mod:
            idx = idx % jnp.asarray(self._level_sizes)[:, None]
        return idx + jnp.asarray(self._offsets)[:, None]

    def _encode_cf(self, params, x_cf):
        """Channel-first core: x_cf [D, B] in [0,1] -> [L*F, B].

        One feature column gather per (corner, feature); every hot array is
        [L, B] or [D, L, B] — batch minor-most, zero tile padding.
        """
        F = self.n_features_per_level
        prepared = isinstance(params, dict)
        if not prepared:
            table = params.reshape(self.total_entries, F)
        xf = x_cf.astype(jnp.float32)

        scales = jnp.asarray(self._scales)  # [L]
        pos = xf[:, None, :] * scales[None, :, None] + 0.5  # [D, L, B]
        cell_f = jnp.floor(pos)
        frac = pos - cell_f
        cell = cell_f.astype(jnp.uint32)

        packed = prepared or (self.packed_gather and F == 2)
        if packed:
            # (bf16(f0), bf16(f1)) packed in one uint32 per table entry
            ptable = (params["ptable"] if prepared
                      else self._pack_table(params))

            def gather(rows):
                v = ptable[rows]
                f0 = jax.lax.bitcast_convert_type(v << jnp.uint32(16),
                                                  jnp.float32)
                f1 = jax.lax.bitcast_convert_type(
                    v & jnp.uint32(0xFFFF0000), jnp.float32)
                return [f0, f1]
        else:
            cols = [table[:, f] for f in range(F)]  # F x [total]

            def gather(rows):
                return [col[rows].astype(jnp.float32) for col in cols]

        interp = self.interpolation.lower()
        if interp == "nearest":
            # Nearest uses the floored cell directly (grid.h:218-233).
            rows = self._corner_rows_cf(cell, 0)
            acc = gather(rows)
        else:
            if interp == "smoothstep":
                frac = frac * frac * (3.0 - 2.0 * frac)
            acc = None
            for corner in range(1 << self.n_dims):
                rows = self._corner_rows_cf(cell, corner)  # [L, B]
                w = jnp.ones(rows.shape, jnp.float32)
                for d in range(self.n_dims):
                    fd = frac[d]
                    w = w * (fd if (corner >> d) & 1 else 1.0 - fd)
                vals = []
                for v in gather(rows):  # F x [L, B]
                    if self.quantize_threshold > 0.0:
                        v = jnp.where(jnp.abs(v) < self.quantize_threshold,
                                      0.0, v)
                    vals.append(w * v)
                acc = vals if acc is None else [a + v
                                                for a, v in zip(acc, vals)]

        # level-major SoA order out[l*F + f] (grid.h:252-256):
        # stack features -> [L, F, B] -> reshape [L*F, B].
        out = jnp.stack(acc, axis=1)
        out = out.reshape(self.n_output_dims, -1)
        return out.astype(jnp.float32 if prepared else params.dtype)

    def encode(self, params, x):
        """x: [..., D] in [0, 1] -> [..., L*F] (channels-last wrapper)."""
        lead = x.shape[:-1]
        x2 = x.reshape(-1, self.n_dims).T  # [D, B]
        out = self._encode_cf(params, x2)  # [L*F, B]
        return out.T.reshape(lead + (self.n_output_dims,))
