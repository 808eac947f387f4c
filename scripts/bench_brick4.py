"""Microbench: 4^3-brick TpuGrid rows vs the 2^3 flagship (VERDICT r3 #3).

A 2^3-brick row stores a 3^3=27-cell neighborhood (27 u32 bf16-pairs,
padded to 64); only 8 of 27 cells are interior, so unique spatial cells
~= 0.30x the stored parameters. A 4^3-brick row stores 5^3=125 cells
(125 u32, padded to 128 — the other w=128 gather sweet spot, 88M rows/s
per bench_gather.py), raising the interior fraction to 64/125 = 0.51x —
1.7x more unique cells at equal parameter count — while still paying ONE
descriptor per (sample, level). The open question this script answers on
the real chip: does the 125-lane weight-dot trilerp (4.6x the VPU MACs
of the 27-lane dot) stay under ~2x the per-sample cost? If yes, the
flagship moves to 4^3 bricks (ROUND3_NOTES design note).

Both variants run the same structure as TpuGridEncoding._encode_cf's
packed path (16 levels, F=2, B=512k, forced-read protocol).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def encode_bricks(ptable, x_cf, scales, offsets, nbricks, dense, rows,
                  brick_w: int):
    """Generic packed brick encode: brick_w in {2, 4}; neighborhood
    (brick_w+1)^3 cells, one u32 bf16-pair per cell."""
    import jax
    import jax.numpy as jnp

    nb_side = brick_w + 1
    ncells = nb_side ** 3
    shift = 1 if brick_w == 2 else 2
    primes = (1, 2654435761, 805459861)
    outs = []
    for lvl in range(len(scales)):
        scale = jnp.float32(scales[lvl])
        pos = x_cf * scale + 0.5
        cell_f = jnp.floor(pos)
        frac = pos - cell_f
        cell = jnp.maximum(cell_f, 0.0).astype(jnp.uint32)
        brick = cell >> jnp.uint32(shift)
        off = cell & jnp.uint32(brick_w - 1)
        if dense[lvl]:
            nb = jnp.uint32(nbricks[lvl])
            row = (brick[0] * nb + brick[1]) * nb + brick[2]
        else:
            row = (brick[0] * jnp.uint32(primes[0])
                   ^ brick[1] * jnp.uint32(primes[1])
                   ^ brick[2] * jnp.uint32(primes[2]))
            row = row & jnp.uint32(rows[lvl] - 1)
        row = row + jnp.uint32(offsets[lvl])

        iw = jnp.arange(nb_side, dtype=jnp.uint32)[None, :]
        ws = []
        for d in range(3):
            o = off[d][:, None]
            f = frac[d][:, None]
            ws.append(jnp.where(iw == o, 1.0 - f,
                                jnp.where(iw == o + 1, f, 0.0)))
        wN = (ws[0][:, :, None, None] * ws[1][:, None, :, None]
              * ws[2][:, None, None, :]).reshape(-1, ncells)

        g = ptable[row]  # [B, padded]
        u = g[:, :ncells]
        lo = jax.lax.bitcast_convert_type(u << jnp.uint32(16), jnp.float32)
        hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000),
                                          jnp.float32)
        outs.append(jnp.sum(wN * lo, axis=1))
        outs.append(jnp.sum(wN * hi, axis=1))
    return jnp.stack(outs, axis=0)


def main():
    from nerf_tpu.utils.compile_cache import enable as enable_cache

    enable_cache(os.path.join(REPO, ".xla_cache"))

    import jax
    import jax.numpy as jnp

    B = 1 << 19
    reps = 5
    base_res, pls, n_levels = 16, 1.3819, 16
    results = {}
    for brick_w, log2_rows, pad in ((2, 14, 64), (4, 12, 128)):
        # equal-ish parameter budget: rows * cells ~= const
        nb_side = brick_w + 1
        ncells = nb_side ** 3
        max_rows = 1 << log2_rows
        scales, rows, offsets, dense, nbricks = [], [], [], [], []
        off = 0
        for lvl in range(n_levels):
            scale = float(np.exp2(np.float32(lvl)
                                  * np.float32(np.log2(pls)))
                          * np.float32(base_res) - np.float32(1.0))
            res = int(np.ceil(np.float32(scale))) + 1
            nb = (res - 1) // brick_w + 1
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
        key = jax.random.PRNGKey(0)
        ptable = jax.random.randint(
            key, (off, pad), 0, np.iinfo(np.int32).max,
            dtype=jnp.int32).astype(jnp.uint32)
        x = jax.random.uniform(jax.random.PRNGKey(1), (3, B), jnp.float32)

        @jax.jit
        def run(pt, xx):
            return jnp.sum(encode_bricks(pt, xx, scales, offsets, nbricks,
                                         dense, rows, brick_w))

        t0 = time.time()
        v = float(np.asarray(run(ptable, x)))
        print(f"[brick{brick_w}] rows={off} pad={pad}: compiled+first "
              f"{time.time()-t0:.1f}s (sum={v:.3e})", file=sys.stderr,
              flush=True)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(ptable, x)))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        results[f"brick{brick_w}"] = B / dt
        print(f"[brick{brick_w}] {B/dt/1e6:.2f}M samples/s "
              f"(median {dt*1e3:.1f}ms, params={off*ncells*2})",
              file=sys.stderr, flush=True)
    results["ratio_2_over_4"] = results["brick2"] / results["brick4"]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
