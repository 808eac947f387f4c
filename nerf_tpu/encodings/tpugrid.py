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

Design: per level, space is tiled into brick_w^3-cell BRICKS (brick_w in
{2, 4}); each table row stores the brick's full (brick_w+1)^3 cell
NEIGHBORHOOD (27 or 125 cells), so the 8 trilinear corners of ANY sample
inside the brick live in ONE row — one descriptor per (sample, level)
instead of eight. 16 descriptors/sample total: ~8x fewer. Corner
extraction from the fetched row is a factorized per-axis weight outer
product, then a standard trilerp (a weight-dot over the row).

Brick size trade (scripts/bench_brick4.py, BASELINE r4): the 2^3 brick
is the SPEED flagship (27-u32 rows padded to 64; 7.7M samples/s) but
only ~0.30x of its stored cells are unique (boundary cells duplicate
across up to 8 adjacent bricks). The 4^3 brick (125-u32 rows padded to
128, the other w-sweet-spot) raises unique cells to ~0.51x — 1.7x the
capacity at equal parameter count — for a measured 1.58x per-sample
cost; it is the QUALITY configuration (config key "brick_w": 4).

Trade-off vs tcnn: boundary cells are not shared between adjacent bricks
(each row owns its neighborhood), so the parameterization is brick-local —
like block-sparse feature grids. At the default budget (log2_rows =
log2_T - 5, i.e. ~84% of tcnn's parameter count: rows*27*F vs 2^T*F) a
trained-from-scratch student measured ~1.7 dB behind the exact hash grid
at 1000 steps (quality_tpugrid_1k.json vs quality_hashgrid_1k.json); the
brick-face consistency regularizer in train/loss.py narrows that gap.
Coarse levels use exact dense brick indexing (no collisions); fine levels
hash the brick coordinate with the tcnn primes (grid.h:90).

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

_N_NEIGHBORHOOD = 27  # 3^3 cells (brick_w=2; kept for external callers)

# measured on v5e (bench_gather.py): slice-16 gathers run 142M rows/s,
# slice-32 collapses to 26M rows/s, slice-64 runs 88M rows/s and
# slice-128 88M rows/s; neighborhood rows are padded to the nearest
# sweet-spot width (64 for 27-cell rows, 128 for 125-cell rows)
_FAST_ROW_U32 = 64


class TpuGridEncoding(Encoding):
    def __init__(self, n_dims: int, config: Dict, alignment: int = 8):
        if n_dims != 3:
            raise ValueError("TpuGrid supports 3-D inputs")
        self.n_dims = 3
        self.brick_w = int(config.get("brick_w", 2))
        if self.brick_w not in (2, 4):
            raise ValueError(f"brick_w must be 2 or 4: {self.brick_w}")
        self.nb_side = self.brick_w + 1          # neighborhood side
        self.ncells = self.nb_side ** 3          # cells per row (27 / 125)
        self._shift = self.brick_w.bit_length() - 1  # log2(brick_w)
        self.n_features_per_level = int(config.get("n_features_per_level", 2))
        if config.get("n_features", 0):
            self.n_levels = (int(config["n_features"])
                             // self.n_features_per_level)
        else:
            self.n_levels = int(config.get("n_levels", 16))
        self.base_resolution = int(config.get("base_resolution", 16))
        self.per_level_scale = float(config.get("per_level_scale", 2.0))
        # parameter budget: default matches tcnn's 2^log2_T entries * F
        # params/level (ncells/row => rows ~ entries/ncells, rounded to
        # pow2: -5 for 27-cell rows, -7 for 125-cell rows)
        if "log2_rows" in config:
            self.log2_rows = int(config["log2_rows"])
        else:
            log2_t = int(config.get("log2_hashmap_size", 19))
            self.log2_rows = max(4, log2_t - (5 if self.brick_w == 2
                                              else 7))
        # Separate row budget for HASHED (non-dense) levels. The hybrid
        # exact-serving path (encodings/hybrid.py) raises log2_rows far
        # above the hash budget so more levels index densely
        # (collision-free by construction) while the hashed levels it
        # never gathers shrink to a token allocation.
        self.log2_rows_hashed = int(config.get("log2_rows_hashed",
                                               self.log2_rows))
        # packed bf16-pair gathers (inference); f32 rows when False (training)
        self.packed_gather = bool(config.get("packed_gather", True))
        # inference row storage: "bf16" (F in {2,4}; 27F/2 u32, padded to
        # 64) or "int8" (F==2 only; 54 int8 + one bf16 per-row scale in 16
        # u32 — the w=16 gather runs 142M rows/s vs w=64's 88M and moves
        # 4x fewer bytes, bench_gather.py)
        self.row_quant = str(config.get("row_quant", "bf16")).lower()
        if self.row_quant not in ("bf16", "int8"):
            raise ValueError(f"row_quant must be bf16|int8: {self.row_quant}")
        if self.row_quant == "int8" and self.brick_w != 2:
            raise ValueError("int8 rows support brick_w=2 only")

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
            # bricks per dim (cells [0, res-1])
            nb = (res - 1) // self.brick_w + 1
            if nb ** 3 <= max_rows:
                r, is_dense = nb ** 3, True
            else:
                r, is_dense = 1 << self.log2_rows_hashed, False
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
        self._n_params = off * self.ncells * self.n_features_per_level
        # packed-row pad width: the nearest measured gather sweet spot
        pairs = self.ncells * (self.n_features_per_level // 2 or 1)
        self._row_pad = 64
        while self._row_pad < pairs:
            self._row_pad *= 2

    @property
    def n_params(self) -> int:
        return self._n_params

    def init_params(self, key=None):
        # tcnn grid init: uniform [-1e-4, 1e-4] (grid.h initialize_params)
        if key is None:
            key = jax.random.PRNGKey(0)
        return jax.random.uniform(key, (self._n_params,), jnp.float32,
                                  -1e-4, 1e-4)

    def _share_keys(self, lvl: int) -> np.ndarray:
        """Absolute-cell key per (row, neighborhood-slot) of one DENSE
        level — int32 [rows_lvl * ncells]. Adjacent bricks' neighborhoods
        overlap (brick b's cells w*b..w*b+w share plane w*b+w with brick
        b+1), so a spatial cell is stored in up to 8 rows; the key maps
        every duplicate to one id."""
        w = self.brick_w
        nbs = self.nb_side
        nb = int(self._nbricks[lvl])
        b = np.arange(nb ** 3, dtype=np.int64)
        bx, by, bz = b // (nb * nb), (b // nb) % nb, b % nb
        offs = np.stack(np.meshgrid(np.arange(nbs), np.arange(nbs),
                                    np.arange(nbs), indexing="ij"),
                        axis=-1).reshape(self.ncells, 3)
        ncell = w * nb + 1
        cx = bx[:, None] * w + offs[None, :, 0]
        cy = by[:, None] * w + offs[None, :, 1]
        cz = bz[:, None] * w + offs[None, :, 2]
        return ((cx * ncell + cy) * ncell + cz).reshape(-1) \
            .astype(np.int32)

    def project_shared_cells(self, params):
        """Average every duplicated boundary cell across the rows that
        store it (dense levels; hashed levels alias rows across bricks,
        so duplicate identity is ill-defined there). Periodic projection
        approximates hard parameter sharing — the brick-local
        parameterization's seams come from duplicates drifting apart
        during training (the soft version is the brick_consistency_loss
        regularizer)."""
        F = self.n_features_per_level
        table = params.reshape(self.total_rows, self.ncells, F)
        for lvl in range(self.n_levels):
            if not self._dense[lvl] or int(self._nbricks[lvl]) < 2:
                continue
            off = int(self._offsets[lvl])
            rows_lvl = int(self._rows[lvl])
            keys = jnp.asarray(self._share_keys(lvl))
            nseg = (self.brick_w * int(self._nbricks[lvl]) + 1) ** 3
            sl = table[off:off + rows_lvl].reshape(-1, F)
            s = jax.ops.segment_sum(sl, keys, num_segments=nseg)
            c = jax.ops.segment_sum(jnp.ones((sl.shape[0],), jnp.float32),
                                    keys, num_segments=nseg)
            mean = s / jnp.maximum(c, 1.0)[:, None]
            table = table.at[off:off + rows_lvl].set(
                mean[keys].reshape(rows_lvl, self.ncells, F))
        return table.reshape(-1)

    def prepare_params(self, params):
        """Build the packed/padded uint32 gather table once (see
        _pack_table / _pack_table_int8). Returns {"ptable": ...} or
        {"qtable": ...} in packed modes, the raw params otherwise.

        The bf16 pack runs on the HOST: on device the [R, ncells, F]
        intermediate materializes in (8, 128) tiles — a 59x HBM write
        amplification (ncells*F pads to 32x128) that OOMs at 43 GB for a
        log2_rows=18 table (measured; the layout trap of BASELINE.md,
        round-4 edition). NumPy packs it tile-free in seconds, using
        ml_dtypes.bfloat16 for the identical round-to-nearest-even
        truncation, and only the packed [R, row_pad] u32 table (1/4 the
        f32 bytes) ever reaches HBM."""
        F = self.n_features_per_level
        if self.packed_gather and self.row_quant == "int8" and F == 2:
            return {"qtable": self._pack_table_int8(params)}
        if self.packed_gather and F in (2, 4):
            return {"ptable": jnp.asarray(self._pack_table_np(params))}
        return params

    def _pack_table_np(self, params):
        """Host-side _pack_table (bit-identical: ml_dtypes bfloat16 uses
        the same RNE rounding as XLA's convert)."""
        import ml_dtypes

        F = self.n_features_per_level
        v = np.asarray(params, np.float32).reshape(
            self.total_rows, self.ncells, F)
        b = v.astype(ml_dtypes.bfloat16).view(np.uint16).astype(np.uint32)
        if F == 2:
            ptable = b[..., 0] | (b[..., 1] << np.uint32(16))
        else:  # F == 4 (see _pack_table)
            even = b[..., 0] | (b[..., 1] << np.uint32(16))
            odd = b[..., 2] | (b[..., 3] << np.uint32(16))
            ptable = np.stack([even, odd], axis=-1).reshape(
                self.total_rows, 2 * self.ncells)
        pad = self._row_pad - ptable.shape[1]
        return np.pad(ptable, ((0, 0), (0, pad)))

    def _bf16_pair(self, a, b):
        lo = jax.lax.bitcast_convert_type(
            a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        hi = jax.lax.bitcast_convert_type(
            b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        return lo | (hi << jnp.uint32(16))

    def _pack_table(self, params):
        """f32 flat params -> [R, _FAST_ROW_U32] uint32 rows: bf16 feature
        pairs, one u32 per pair (F=2: 27 u32/row; F=4: 54 u32/row —
        cell-major, features interleaved), padded to 64 u32 (slice widths
        17..63 hit a v5e gather cliff at 16-32M rows/s while 64 runs
        88M rows/s — bench_gather.py / BASELINE.md)."""
        F = self.n_features_per_level
        table = params.reshape(self.total_rows, self.ncells, F)
        if F == 2:
            ptable = self._bf16_pair(table[..., 0], table[..., 1])
        else:  # F == 4: u32[2i] = (f0,f1), u32[2i+1] = (f2,f3)
            even = self._bf16_pair(table[..., 0], table[..., 1])
            odd = self._bf16_pair(table[..., 2], table[..., 3])
            ptable = jnp.stack([even, odd], axis=-1).reshape(
                self.total_rows, 2 * self.ncells)
        pad = self._row_pad - ptable.shape[1]
        return jnp.pad(ptable, ((0, 0), (0, pad)))

    _INT8_ROW_U32 = 16

    def _pack_table_int8(self, params):
        """f32 flat params -> [R, 16] uint32 rows: 54 int8 quantized cell
        features (cell-major, q[2i+f]) in u32 0..13 (little-endian bytes,
        2 pad bytes), the per-row bf16 dequant scale in u32 14, pad in 15.
        Quantization uses the bf16-rounded scale so dequant is exact."""
        F = self.n_features_per_level
        v = params.reshape(self.total_rows, self.ncells * F)
        amax = jnp.max(jnp.abs(v), axis=1, keepdims=True)
        scale_b = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.bfloat16)
        scale = scale_b.astype(jnp.float32)
        q = jnp.clip(jnp.round(v / scale), -127, 127).astype(jnp.int32)
        qb = (q & 0xFF).astype(jnp.uint32)              # [R, 54] bytes
        qb = jnp.pad(qb, ((0, 0), (0, 56 - self.ncells * F)))
        qb = qb.reshape(self.total_rows, 14, 4)
        words = (qb[..., 0] | (qb[..., 1] << 8) | (qb[..., 2] << 16)
                 | (qb[..., 3] << 24))                  # [R, 14]
        s_u32 = jax.lax.bitcast_convert_type(
            scale_b[:, 0], jnp.uint16).astype(jnp.uint32)[:, None]
        zero = jnp.zeros_like(s_u32)
        return jnp.concatenate([words, s_u32, zero], axis=1)  # [R, 16]

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
        brick = cell >> jnp.uint32(self._shift)
        off = cell & jnp.uint32(self.brick_w - 1)
        if self._dense[lvl]:
            nb = jnp.uint32(self._nbricks[lvl])
            row = (brick[0] * nb + brick[1]) * nb + brick[2]
        else:
            row = (brick[0] * jnp.uint32(_PRIMES[0])
                   ^ brick[1] * jnp.uint32(_PRIMES[1])
                   ^ brick[2] * jnp.uint32(_PRIMES[2]))
            row = row & jnp.uint32(self._rows[lvl] - 1)  # rows are pow2
        return row + jnp.uint32(self._offsets[lvl]), off, frac

    def _axis_weights(self, off_d, frac_d):
        """Per-axis trilinear weights over the nb_side neighborhood
        positions.

        off_d [B] in {0..brick_w-1}, frac_d [B] -> [B, nb_side] with
        weight (1-f) at position off, f at off+1, 0 elsewhere."""
        i = jnp.arange(self.nb_side, dtype=jnp.uint32)[None, :]
        o = off_d[:, None]
        f = frac_d[:, None].astype(jnp.float32)
        return jnp.where(i == o, 1.0 - f, jnp.where(i == o + 1, f, 0.0))

    def _encode_cf(self, params, x_cf):
        """x_cf [3, B] in [0,1] -> [L*F, B] level-major features.

        Per level: ONE row gather, then the trilerp is a dot of the
        fetched 27-cell row with a per-sample 27-weight vector (the outer
        product of three [B,3] axis weights — zero for the 19 cells
        outside the sample's corner cube). Everything stays in the
        gathered [B, 27] layout: no per-column lane extraction, which
        measured 4.5x slower (bench_gather.py / BASELINE.md)."""
        F = self.n_features_per_level
        prepared = isinstance(params, dict)
        int8_mode = prepared and "qtable" in params
        packed = prepared or (self.packed_gather and F in (2, 4))
        if int8_mode:
            qtable = params["qtable"]
        elif prepared:
            ptable = params["ptable"]
        elif packed:
            ptable = self._pack_table(params)
        else:
            ftable = params.reshape(self.total_rows,
                                    self.ncells * F)

        outs = []
        for lvl in range(self.n_levels):
            row, off, frac = self._rows_for_level(x_cf, lvl)
            wx = self._axis_weights(off[0], frac[0])
            wy = self._axis_weights(off[1], frac[1])
            wz = self._axis_weights(off[2], frac[2])
            w27 = (wx[:, :, None, None] * wy[:, None, :, None]
                   * wz[:, None, None, :]).reshape(-1, self.ncells)

            def _lo(u):
                return jax.lax.bitcast_convert_type(u << jnp.uint32(16),
                                                    jnp.float32)

            def _hi(u):
                return jax.lax.bitcast_convert_type(
                    u & jnp.uint32(0xFFFF0000), jnp.float32)

            if int8_mode:
                g = qtable[row]                       # [B, 16] u32
                u = g[:, :14]
                qb = jnp.stack([(u >> jnp.uint32(sh)) & jnp.uint32(0xFF)
                                for sh in (0, 8, 16, 24)], axis=-1)
                qb = qb.reshape(-1, 56)[:, :self.ncells * 2]
                qi = qb.astype(jnp.int32)
                qi = qi - ((qi >> 7) << 8)            # sign-extend int8
                scale = jax.lax.bitcast_convert_type(
                    (g[:, 14] & jnp.uint32(0xFFFF)) << jnp.uint32(16),
                    jnp.float32)
                for f in range(2):
                    plane = qi[:, f::2].astype(jnp.float32)
                    outs.append(jnp.sum(w27 * plane, axis=1) * scale)
            elif packed:
                g = ptable[row]                       # ONE descriptor/sample
                if F == 2:
                    planes = [_lo(g[:, :self.ncells]),
                              _hi(g[:, :self.ncells])]
                else:  # F == 4
                    even = g[:, 0:2 * self.ncells:2]
                    odd = g[:, 1:2 * self.ncells:2]
                    planes = [_lo(even), _hi(even), _lo(odd), _hi(odd)]
                for plane in planes:
                    outs.append(jnp.sum(w27 * plane, axis=1))
            else:
                g = ftable[row].reshape(-1, self.ncells, F)
                r = jnp.sum(w27[:, :, None] * g.astype(jnp.float32), axis=1)
                for f in range(F):
                    outs.append(r[:, f])

        out = jnp.stack(outs, axis=0)  # [L*F, B] level-major
        return out.astype(jnp.float32 if prepared else params.dtype)

    def encode(self, params, x):
        lead = x.shape[:-1]
        out = self._encode_cf(params, x.reshape(-1, 3).T)
        return out.T.reshape(lead + (self.n_output_dims,))

    # ------------------------------------------------------------------
    def brick_consistency_loss(self, params, key, n_bricks: int = 1024):
        """Mean squared mismatch between shared-boundary cells of
        adjacent bricks (training regularizer).

        The brick-local parameterization stores each brick's 3x3x3
        neighborhood independently, so the SAME absolute cell (e.g.
        2b+2 along x — brick b's face plane and brick b+1's entry plane)
        has two independent copies that can drift apart during training;
        the measured cost was ~1.7 dB vs the exact hash grid at 1000
        steps (quality records, VERDICT r2 item 6). Sampling n_bricks
        random (brick, +axis-neighbor) pairs per level and penalizing
        face-plane disagreement restores the shared-cell constraint
        stochastically. f32 (training) params only.
        """
        F = self.n_features_per_level
        nbs = self.nb_side
        table = params.reshape(self.total_rows, self.ncells, F)
        # neighborhood index (cx*nbs+cy)*nbs+cz; face planes per axis:
        planes = []
        idx3 = np.arange(self.ncells).reshape(nbs, nbs, nbs)
        for ax in range(3):
            # this brick's face plane vs the +axis neighbor's entry plane
            hi = np.take(idx3, nbs - 1, axis=ax).reshape(-1)
            lo = np.take(idx3, 0, axis=ax).reshape(-1)
            planes.append((jnp.asarray(hi), jnp.asarray(lo)))

        total = jnp.float32(0.0)
        n_terms = 0
        for lvl in range(self.n_levels):
            nb = int(self._nbricks[lvl])
            if nb < 2:
                continue
            k = jax.random.fold_in(key, lvl)
            bricks = jax.random.randint(k, (n_bricks, 3), 0, nb - 1,
                                        dtype=jnp.int32).astype(jnp.uint32)
            for ax in range(3):
                nbr = bricks.at[:, ax].add(jnp.uint32(1))
                rows_a = self._brick_rows(bricks, lvl)
                rows_b = self._brick_rows(nbr, lvl)
                hi, lo = planes[ax]
                a = table[rows_a][:, hi, :]
                b = table[rows_b][:, lo, :]
                total = total + jnp.mean((a - b) ** 2)
                n_terms += 1
        return total / max(n_terms, 1)

    def _brick_rows(self, bricks, lvl: int):
        """Global row index for brick coords [K, 3] uint32 at a level
        (the same dense/hash mapping as _rows_for_level)."""
        if self._dense[lvl]:
            nb = jnp.uint32(self._nbricks[lvl])
            row = (bricks[:, 0] * nb + bricks[:, 1]) * nb + bricks[:, 2]
        else:
            row = (bricks[:, 0] * jnp.uint32(_PRIMES[0])
                   ^ bricks[:, 1] * jnp.uint32(_PRIMES[1])
                   ^ bricks[:, 2] * jnp.uint32(_PRIMES[2]))
            row = row & jnp.uint32(self._rows[lvl] - 1)
        return row + jnp.uint32(self._offsets[lvl])
