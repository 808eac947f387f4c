"""Composite encoding: dispatch nested encodings over input-dim ranges.

Reference parity: tcnn `CompositeEncoding`
(dependencies/tiny-cuda-nn/include/tiny-cuda-nn/encodings/composite.h):
  - nested encodings claim `n_dims_to_encode` slices of the input in order;
    at most one nested encoding may leave it unspecified (gets the rest);
    zero-dim nested encodings are dropped (composite.h ctor)
  - Concatenation reduction: outputs concatenated, alignments adjusted so
    each nested block starts aligned; the base config's
    [SH(3, deg4), Identity] composite reduces to plain SH-16
    (configs/nerf/base.json:37-51)
  - params concatenated in nested order
"""
from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp

from nerf_tpu.encodings.base import Encoding, next_multiple


class CompositeEncoding(Encoding):
    def __init__(self, n_dims: int, config: Dict, alignment: int = 8):
        from nerf_tpu.encodings.factory import create_encoding

        self.n_dims = int(n_dims)
        self.alignment = max(1, int(alignment))
        nested_cfgs = config.get("nested")
        if not isinstance(nested_cfgs, list):
            raise ValueError("CompositeEncoding requires a 'nested' array")
        self.reduction = str(config.get("reduction", "Concatenation"))
        if self.reduction != "Concatenation":
            raise NotImplementedError(
                "Only Concatenation reduction is supported")

        total_specified = 0
        unspecified_seen = False
        for c in nested_cfgs:
            if "n_dims_to_encode" in c:
                total_specified += int(c["n_dims_to_encode"])
            else:
                if unspecified_seen:
                    raise ValueError(
                        "only one nested encoding may omit n_dims_to_encode")
                unspecified_seen = True
        if total_specified > n_dims:
            raise ValueError("nested encodings claim more dims than available")
        remainder = n_dims - total_specified

        self.nested: List[Encoding] = []
        self.dim_begin: List[int] = []
        offset = 0
        for c in nested_cfgs:
            nd = int(c.get("n_dims_to_encode", remainder))
            if "n_dims_to_encode" not in c:
                remainder = 0
            if nd > 0:
                self.nested.append(create_encoding(nd, c, alignment=1))
                self.dim_begin.append(offset)
            offset += nd

        # Alignment fix-up so each following block starts aligned
        # (composite.h ctor, Concatenation branch).
        dims_so_far = 0
        for i in range(len(self.nested) - 1):
            want = self.nested[i + 1].alignment
            need = next_multiple(dims_so_far, want) - dims_so_far
            if need > 0:
                self.nested[i].set_alignment(need)
            dims_so_far += self.nested[i].padded_output_dim

        self.n_output_dims = sum(e.padded_output_dim for e in self.nested)

    @property
    def n_params(self) -> int:
        return sum(e.n_params for e in self.nested)

    def init_params(self, key=None):
        import jax

        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, max(1, len(self.nested)))
        parts = [e.init_params(k) for e, k in zip(self.nested, keys)]
        if not parts:
            return jnp.zeros((0,), jnp.float32)
        return jnp.concatenate(parts)

    def _split_params(self, params):
        out, off = [], 0
        for e in self.nested:
            out.append(params[off:off + e.n_params])
            off += e.n_params
        return out

    def encode(self, params, x):
        parts = []
        for enc, begin, p in zip(self.nested, self.dim_begin,
                                 self._split_params(params)):
            parts.append(enc.apply(p, x[..., begin:begin + enc.n_dims]))
        return jnp.concatenate(parts, axis=-1)

    def _encode_cf(self, params, x_cf):
        parts = []
        for enc, begin, p in zip(self.nested, self.dim_begin,
                                 self._split_params(params)):
            parts.append(enc.apply_cf(p, x_cf[begin:begin + enc.n_dims]))
        return jnp.concatenate(parts, axis=0)
