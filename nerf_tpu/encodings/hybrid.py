"""Hybrid exact grid encoding: tcnn parity at TpuGrid speed where provable.

The tcnn-exact GridEncoding (encodings/hashgrid.py) is the always-correct
path for foreign instant-ngp snapshots (reference use case:
src/nerf_render.cu:431-473 feeding grid.h:82-117) but pays 8 corner
descriptors per (sample, level). The TpuGrid conversion
(encodings/convert.py) pays ONE descriptor per (sample, level) and is
EXACT for every level whose occupied bricks landed collision-free
(dense levels by construction; hashed levels whenever
max_bricks_per_row <= 1 for the snapshot's occupancy — auto-sized rows
make this the common case for converged, pruned snapshots).

This encoding serves each level from whichever table is exact-and-fast:
  - `exact` levels  -> converted brick rows, 1 row gather (TpuGrid math)
  - other levels    -> tcnn 8-corner gathers (bit-faithful fallback)

Per-sample descriptors drop from 8L to L_exact + 8*L_hash. On the
default 16-level schedule with ~6 dense levels that is already >=1.5x;
on a converged snapshot where auto-sized rows absorb most hashed levels
it approaches the full 8x. Output equals the pure tcnn path to trilerp
reassociation ULPs (the 27-weight dot sums the same 8 corner products
in a different order); tests/test_hybrid.py pins the parity.

Parameters are the concatenation [tcnn_flat | tpu_row_flat]; the
prepared form packs both gather tables once (bf16 pairs either side).
"""
from __future__ import annotations

import copy
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from nerf_tpu.encodings.base import Encoding
from nerf_tpu.encodings.hashgrid import GridEncoding
from nerf_tpu.encodings.tpugrid import TpuGridEncoding


def _subset_grid(enc: GridEncoding, levels: Sequence[int]) -> GridEncoding:
    """Shallow view of a GridEncoding restricted to `levels`: the static
    per-level tables are subsetted while the global table OFFSETS stay
    absolute, so the view gathers from the full shared parameter table."""
    sub = copy.copy(enc)
    idx = np.asarray(levels, np.int64)
    sub.n_levels = len(levels)
    sub.n_output_dims = sub.n_levels * enc.n_features_per_level
    sub._scales = enc._scales[idx]
    sub._resolutions = enc._resolutions[idx]
    sub._level_sizes = enc._level_sizes[idx]
    sub._offsets = enc._offsets[idx]
    sub._use_hash = enc._use_hash[idx]
    sub._include_dim = enc._include_dim[idx]
    sub._and_mask = enc._and_mask[idx]
    sub._needs_sub = [enc._needs_sub[i] for i in levels]
    sub._sub_mask = enc._sub_mask[idx]
    sub._needs_mod = any((enc._level_sizes[i] & (enc._level_sizes[i] - 1))
                         != 0 and not enc._needs_sub[i] for i in levels)
    return sub


def _subset_tpugrid(enc: TpuGridEncoding,
                    levels: Sequence[int]) -> TpuGridEncoding:
    """Same trick for TpuGridEncoding: level tables subsetted, row
    offsets absolute into the full converted row table."""
    sub = copy.copy(enc)
    idx = np.asarray(levels, np.int64)
    sub.n_levels = len(levels)
    sub.n_output_dims = sub.n_levels * enc.n_features_per_level
    sub._scales = enc._scales[idx]
    sub._rows = enc._rows[idx]
    sub._offsets = enc._offsets[idx]
    sub._dense = enc._dense[idx]
    sub._nbricks = enc._nbricks[idx]
    return sub


class HybridGridEncoding(Encoding):
    """See module docstring. exact_levels[i] selects the row-served set."""

    def __init__(self, tcnn_enc: GridEncoding, tpu_enc: TpuGridEncoding,
                 exact_levels: Sequence[bool], alignment: int = 8):
        if tcnn_enc.n_levels != tpu_enc.n_levels:
            raise ValueError("level counts differ")
        self.n_dims = 3
        self.tcnn = tcnn_enc
        self.tpu = tpu_enc
        self.exact_levels = tuple(bool(b) for b in exact_levels)
        self.n_levels = tcnn_enc.n_levels
        self.n_features_per_level = tcnn_enc.n_features_per_level
        self.n_output_dims = tcnn_enc.n_output_dims
        self.alignment = max(1, int(alignment))
        self._row_levels = [i for i, b in enumerate(self.exact_levels) if b]
        self._cor_levels = [i for i, b in enumerate(self.exact_levels)
                            if not b]
        self._tpu_view = (_subset_tpugrid(tpu_enc, self._row_levels)
                          if self._row_levels else None)
        self._tcnn_view = (_subset_grid(tcnn_enc, self._cor_levels)
                           if self._cor_levels else None)

    @property
    def n_params(self) -> int:
        return self.tcnn.n_params + self.tpu.n_params

    @property
    def packed_gather(self) -> bool:
        return self.tcnn.packed_gather

    @packed_gather.setter
    def packed_gather(self, v: bool) -> None:
        # propagate to both sub-encodings AND their shallow level views
        # (copy.copy gave the views their own __dict__)
        for e in (self.tcnn, self.tpu, self._tcnn_view, self._tpu_view):
            if e is not None:
                e.packed_gather = bool(v)

    def split_params(self, params) -> Tuple:
        return (params[:self.tcnn.n_params], params[self.tcnn.n_params:])

    def init_params(self, key=None):
        return jnp.concatenate([self.tcnn.init_params(key),
                                self.tpu.init_params(key)])

    def prepare_params(self, params):
        if isinstance(params, dict):
            return params
        tc, tp = self.split_params(params)
        return {"tcnn": self.tcnn.prepare_params(tc),
                "tpu": self.tpu.prepare_params(tp)}

    def _encode_cf(self, params, x_cf):
        if isinstance(params, dict):
            tc_p, tp_p = params["tcnn"], params["tpu"]
        else:
            tc_p, tp_p = self.split_params(params)
        F = self.n_features_per_level
        B = x_cf.shape[1]
        parts: List = [None] * self.n_levels
        if self._tpu_view is not None:
            rows_out = self._tpu_view._encode_cf(tp_p, x_cf)  # [Lr*F, B]
            for j, lvl in enumerate(self._row_levels):
                parts[lvl] = rows_out[j * F:(j + 1) * F]
        if self._tcnn_view is not None:
            cor_out = self._tcnn_view._encode_cf(tc_p, x_cf)  # [Lc*F, B]
            for j, lvl in enumerate(self._cor_levels):
                parts[lvl] = cor_out[j * F:(j + 1) * F]
        out = jnp.concatenate(parts, axis=0)
        assert out.shape == (self.n_output_dims, B)
        return out

    def encode(self, params, x):
        lead = x.shape[:-1]
        out = self._encode_cf(params, x.reshape(-1, 3).T)
        return out.T.reshape(lead + (self.n_output_dims,))


def build_hybrid_from_conversion(tcnn_enc: GridEncoding,
                                 tcnn_params: np.ndarray,
                                 tpu_enc: TpuGridEncoding,
                                 tpu_params: np.ndarray,
                                 stats: Dict) -> Tuple[HybridGridEncoding,
                                                       np.ndarray]:
    """Assemble the hybrid encoding + its flat parameter vector from a
    finished tcnn_to_tpugrid conversion. A level is served from rows iff
    the conversion proves it exact for the snapshot's occupancy: dense
    TpuGrid indexing, or hashed with max one occupied brick per row."""
    exact = []
    by_level = {d["level"]: d for d in stats["levels"]}
    for lvl in range(tpu_enc.n_levels):
        d = by_level.get(lvl)
        if bool(tpu_enc._dense[lvl]):
            exact.append(True)
        elif d is not None and d["bricks"] > 0 \
                and d["max_bricks_per_row"] <= 1:
            exact.append(True)
        else:
            exact.append(False)
    enc = HybridGridEncoding(tcnn_enc, tpu_enc, exact)
    flat = np.concatenate([np.asarray(tcnn_params, np.float32).reshape(-1),
                           np.asarray(tpu_params, np.float32).reshape(-1)])
    return enc, flat
