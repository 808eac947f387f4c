"""TpuGrid: TPU-native multiresolution feature grid (the T1 redesign).

Reference capability parity: tiny-cuda-nn `GridEncodingTemplated`
(dependencies/tiny-cuda-nn/include/tiny-cuda-nn/encodings/grid.h:139-311)
— same role (multiresolution hash-grid positional encoding for NeRF), same
level-scale schedule (grid.h:190-192), same level-major SoA output
(grid.h:252-256). The exact tcnn layout lives in encodings/hashgrid.py and
stays the loader for foreign instant-ngp snapshots; THIS encoding is the
performance path, re-parameterized for how a TPU actually accesses memory.

Why a different layout (measured on v5e, see bench_gather.py + BASELINE.md):
  XLA gathers are DESCRIPTOR-bound: ~125M random rows/s regardless of
  table size, and a row can carry ~16-64 elements nearly free (slice-16:
  142M rows/s, slice-64: 88M rows/s; slice-32 hits a pathological 26M
  rows/s cliff — avoided below). tcnn's per-corner hashing costs
  16 levels x 8 corners = 128 descriptors per sample; at 125M/s that caps
  encoding at ~1M samples/s/chip no matter how good the kernel is.

Design: per level, space is tiled into 2x2x2-cell BRICKS; each table row
stores the brick's full 3x3x3 cell NEIGHBORHOOD (27 cells), so the 8
trilinear corners of ANY sample inside the brick live in ONE row — one
descriptor per (sample, level) instead of eight. 16 descriptors/sample
total: ~8x fewer. Corner extraction from the fetched row is 38 VPU selects
(factorized per axis), then a standard trilerp.

Trade-off vs tcnn: boundary cells are not shared between adjacent bricks
(each row owns its neighborhood), so the parameterization is brick-local —
like block-sparse feature grids; trained end-to-end it matches hash-grid
capacity at equal parameter count. Coarse levels use exact dense brick
indexing (no collisions); fine levels hash the brick coordinate with the
tcnn primes (grid.h:90).

Row storage: packed mode puts the bf16 feature pair of each cell in one
uint32 (27 used + pad), padded to a slice width chosen from the measured
rate curve; unpacked mode stores f32 [27*F] rows (differentiable — the
training path).
"""
from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.encodings.base import Encoding

# tcnn fast_hash primes (grid.h:90), applied to brick coords
_PRIMES = (1, 2654435761, 805459861)

_N_NEIGHBORHOOD = 27  # 3^3 cells

# measured on v5e (bench_gather.py): slice-16 gathers run 142M rows/s,
# slice-32 collapses to 26M rows/s, slice-64 runs 88M rows/s; the 27-u32
# neighborhood row is padded to whichever width measures fastest
_FAST_ROW_U32 = 64


class TpuGridEncoding(Encoding):
    def __init__(self, n_dims: int, config: Dict, alignment: int = 8):
        if n_dims != 3:
            raise ValueError("TpuGrid supports 3-D inputs")
        self.n_dims = 3
        self.n_features_per_level = int(config.get("n_features_per_level", 2))
        if config.get("n_features", 0):
            self.n_levels = (int(config["n_features"])
                             // self.n_features_per_level)
        else:
            self.n_levels = int(config.get("n_levels", 16))
        self.base_resolution = int(config.get("base_resolution", 16))
        self.per_level_scale = float(config.get("per_level_scale", 2.0))
        # parameter budget: default matches tcnn's 2^log2_T entries * F
        # params/level (27 cells/row => rows ~ entries/27, rounded to pow2)
        if "log2_rows" in config:
            self.log2_rows = int(config["log2_rows"])
        else:
            log2_t = int(config.get("log2_hashmap_size", 19))
            self.log2_rows = max(4, log2_t - 5)
        # packed bf16-pair gathers (inference); f32 rows when False (training)
        self.packed_gather = bool(config.get("packed_gather", True))

        self.n_output_dims = self.n_levels * self.n_features_per_level
        self.alignment = max(1, int(alignment))

        log2b = np.float32(math.log2(self.per_level_scale))
        max_rows = 1 << self.log2_rows
        scales: List[float] = []
        rows: List[int] = []
        offsets: List[int] = []
        dense: List[bool] = []
        nbricks: List[int] = []
        off = 0
        for lvl in range(self.n_levels):
            scale = float(np.exp2(np.float32(lvl) * log2b)
                          * np.float32(self.base_resolution)
                          - np.float32(1.0))
            res = int(np.ceil(np.float32(scale))) + 1
            nb = (res - 1) // 2 + 1  # bricks per dim (cells [0, res-1])
            if nb ** 3 <= max_rows:
                r, is_dense = nb ** 3, True
            else:
                r, is_dense = max_rows, False
            scales.append(scale)
            rows.append(r)
            offsets.append(off)
            dense.append(is_dense)
            nbricks.append(nb)
            off += r
        self._scales = np.asarray(scales, np.float32)
        self._rows = np.asarray(rows, np.uint32)
        self._offsets = np.asarray(offsets, np.uint32)
        self._dense = np.asarray(dense, bool)
        self._nbricks = np.asarray(nbricks, np.uint32)
        self.total_rows = off
        self._n_params = off * _N_NEIGHBORHOOD * self.n_features_per_level

    @property
    def n_params(self) -> int:
        return self._n_params

    def init_params(self, key=None):
        # tcnn grid init: uniform [-1e-4, 1e-4] (grid.h initialize_params)
        if key is None:
            key = jax.random.PRNGKey(0)
        return jax.random.uniform(key, (self._n_params,), jnp.float32,
                                  -1e-4, 1e-4)

    # ------------------------------------------------------------------
    def _rows_for_level(self, x_cf, lvl: int):
        """Brick row + within-brick offsets + fracs for one level.

        x_cf [3, B] in [0,1] -> (row [B] uint32, off [3, B] uint32 in {0,1},
        frac [3, B] f32)."""
        scale = jnp.float32(self._scales[lvl])
        pos = x_cf.astype(jnp.float32) * scale + 0.5  # grid.h pos_fract
        cell_f = jnp.floor(pos)
        frac = pos - cell_f
        cell = jnp.maximum(cell_f, 0.0).astype(jnp.uint32)
        brick = cell >> jnp.uint32(1)
        off = cell & jnp.uint32(1)
        if self._dense[lvl]:
            nb = jnp.uint32(self._nbricks[lvl])
            row = (brick[0] * nb + brick[1]) * nb + brick[2]
        else:
            row = (brick[0] * jnp.uint32(_PRIMES[0])
                   ^ brick[1] * jnp.uint32(_PRIMES[1])
                   ^ brick[2] * jnp.uint32(_PRIMES[2]))
            row = row & jnp.uint32(self._rows[lvl] - 1)  # rows are pow2
        return row + jnp.uint32(self._offsets[lvl]), off, frac

    @staticmethod
    def _select_subcube(g27, off):
        """Per-axis factorized selection of the 2x2x2 corner sub-cube.

        g27: list of 27 [B]-vectors (x-major: col = x*9 + y*3 + z);
        off: [3, B] within-brick offsets in {0,1}.
        Returns U[(i,j,k)] -> [B] for i,j,k in {0,1} (38 selects total)."""
        ox = off[0] == 1
        oy = off[1] == 1
        oz = off[2] == 1
        # z: [3,3,3] -> [3,3,2]
        a = {(x, y, c): jnp.where(oz, g27[x * 9 + y * 3 + c + 1],
                                  g27[x * 9 + y * 3 + c])
             for x in range(3) for y in range(3) for c in range(2)}
        # y: -> [3,2,2]
        b = {(x, bb, c): jnp.where(oy, a[(x, bb + 1, c)], a[(x, bb, c)])
             for x in range(3) for bb in range(2) for c in range(2)}
        # x: -> [2,2,2]
        return {(i, j, k): jnp.where(ox, b[(i + 1, j, k)], b[(i, j, k)])
                for i in range(2) for j in range(2) for k in range(2)}

    def _encode_cf(self, params, x_cf):
        """x_cf [3, B] in [0,1] -> [L*F, B] level-major features."""
        F = self.n_features_per_level
        packed = self.packed_gather and F == 2
        if packed:
            table = params.reshape(self.total_rows, _N_NEIGHBORHOOD, F)
            b0 = jax.lax.bitcast_convert_type(
                table[..., 0].astype(jnp.bfloat16), jnp.uint16
            ).astype(jnp.uint32)
            b1 = jax.lax.bitcast_convert_type(
                table[..., 1].astype(jnp.bfloat16), jnp.uint16
            ).astype(jnp.uint32)
            ptable = b0 | (b1 << jnp.uint32(16))  # [R, 27]
            # pad the row to the measured fast slice width (slice-32 hits
            # a v5e gather cliff — see bench_gather.py)
            pad = _FAST_ROW_U32 - _N_NEIGHBORHOOD
            ptable = jnp.pad(ptable, ((0, 0), (0, pad)))
        else:
            ftable = params.reshape(self.total_rows,
                                    _N_NEIGHBORHOOD * F)

        outs = []
        for lvl in range(self.n_levels):
            row, off, frac = self._rows_for_level(x_cf, lvl)
            if packed:
                g = ptable[row]  # [B, row_u32] — ONE descriptor per sample
                cols = [g[:, c] for c in range(_N_NEIGHBORHOOD)]
                u = self._select_subcube(cols, off)

                def unpack(v):
                    f0 = jax.lax.bitcast_convert_type(
                        v << jnp.uint32(16), jnp.float32)
                    f1 = jax.lax.bitcast_convert_type(
                        v & jnp.uint32(0xFFFF0000), jnp.float32)
                    return f0, f1

                corner_feats = {k: unpack(v) for k, v in u.items()}
            else:
                g = ftable[row]  # [B, 27*F]
                cols = [[g[:, c * F + f] for f in range(F)]
                        for c in range(_N_NEIGHBORHOOD)]
                u = {}
                for f in range(F):
                    uf = self._select_subcube(
                        [cols[c][f] for c in range(_N_NEIGHBORHOOD)], off)
                    for k_, v in uf.items():
                        u.setdefault(k_, []).append(v)
                corner_feats = {k_: tuple(v) for k_, v in u.items()}

            fx, fy, fz = frac[0], frac[1], frac[2]
            feats = []
            for f in range(F):
                acc = jnp.zeros(x_cf.shape[1], jnp.float32)
                for (i, j, k), vals in corner_feats.items():
                    w = ((fx if i else 1.0 - fx)
                         * (fy if j else 1.0 - fy)
                         * (fz if k else 1.0 - fz))
                    acc = acc + w * vals[f].astype(jnp.float32)
                feats.append(acc)
            outs.append(jnp.stack(feats, 0))  # [F, B]

        out = jnp.concatenate(outs, axis=0)  # [L*F, B] level-major
        return out.astype(params.dtype)

    def encode(self, params, x):
        lead = x.shape[:-1]
        out = self._encode_cf(params, x.reshape(-1, 3).T)
        return out.T.reshape(lead + (self.n_output_dims,))
