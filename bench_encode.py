"""Microbench: TpuGrid encode modes on the real chip.

Measures samples/s through _encode_cf for the three row storage modes:
  f2-bf16: 16 levels x F=2, 64-u32 bf16 rows (the round-2 flagship:
           12.47M samples/s, BASELINE.md)
  f4-bf16: 8 levels x F=4, 64-u32 rows — half the descriptors at equal
           output width (32 dims)
  f2-int8: 16 levels x F=2, 16-u32 int8+scale rows — w=16 gather class
           (142M rows/s) and 4x fewer bytes

Protocol per tpu-relay rules (BASELINE.md): forced host read of a
reduced scalar per repetition; median of reps reported.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main():
    from nerf_tpu.utils.compile_cache import enable as enable_cache

    enable_cache(os.path.join(REPO, ".xla_cache"))

    import jax
    import jax.numpy as jnp

    from nerf_tpu.encodings.tpugrid import TpuGridEncoding

    B = 1 << 19  # 524288 samples
    reps = 5
    modes = {
        "f2-bf16": dict(n_levels=16, n_features_per_level=2, log2_rows=14,
                        base_resolution=16, per_level_scale=1.3819,
                        packed_gather=True),
        "f4-bf16": dict(n_levels=8, n_features_per_level=4, log2_rows=14,
                        base_resolution=16, per_level_scale=2.0,
                        packed_gather=True),
        "f2-int8": dict(n_levels=16, n_features_per_level=2, log2_rows=14,
                        base_resolution=16, per_level_scale=1.3819,
                        packed_gather=True, row_quant="int8"),
    }
    x = jax.random.uniform(jax.random.PRNGKey(0), (3, B), jnp.float32)
    results = {}
    for name, cfg in modes.items():
        enc = TpuGridEncoding(3, cfg)
        params = enc.init_params(jax.random.PRNGKey(1))
        prep = enc.prepare_params(params)

        @jax.jit
        def run(p, xx):
            return jnp.sum(enc._encode_cf(p, xx))

        t0 = time.time()
        v = float(np.asarray(run(prep, x)))  # compile + first run
        print(f"[encode] {name}: compiled+first in {time.time()-t0:.1f}s "
              f"(sum={v:.3e})", file=sys.stderr, flush=True)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(prep, x)))  # forced read = real sync
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        rate = B / dt
        results[name] = rate
        print(f"[encode] {name}: {rate/1e6:.2f}M samples/s "
              f"(median {dt*1e3:.1f}ms over {reps})",
              file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
