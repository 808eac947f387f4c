"""Hash-table gather microbenchmarks on the real chip.

Measures the one number that bounds the whole renderer (BASELINE.md
roofline): random-access rate from an HBM-resident table, as a function
of slice width, table size, and access pattern. The hash-grid encode does
128 such accesses per sample (16 levels x 8 corners), so every design
decision (packed pairs, per-level tables, bricked layouts, Pallas DMA)
reduces to "does it raise descriptors/s or bytes/descriptor".

Protocol (BASELINE.md): jax.block_until_ready is ASYNC through the relay;
every timing is forced by a host read of a reduced scalar, and workloads
are sized to multiple seconds. Results print as one JSON line per config.

Usage: python bench_gather.py [--quick]
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.abspath(__file__))


def _force(x):
    return float(np.asarray(jnp.sum(x)))


@functools.partial(jax.jit, static_argnames=("n_iter", "table_rows"))
def _gather_loop(table, idx, n_iter: int, table_rows: int):
    """n_iter gathers of idx.size rows; indices perturbed per iteration so
    XLA cannot CSE, accumulated so nothing is dead."""

    def body(i, acc):
        rows = (idx + i.astype(jnp.uint32)) & jnp.uint32(table_rows - 1)
        v = table[rows]
        return acc + jnp.sum(v.astype(jnp.float32))

    return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))


def measure_gather(table_rows: int, slice_w: int, n_idx: int, n_iter: int,
                   dtype="uint32"):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    if slice_w == 0:  # flat 1-D table
        table = jax.random.randint(k1, (table_rows,), 0, 1 << 30,
                                   jnp.uint32).astype(dtype)
    else:
        table = jax.random.randint(k1, (table_rows, slice_w), 0, 1 << 30,
                                   jnp.uint32).astype(dtype)
    idx = jax.random.randint(k2, (n_idx,), 0, table_rows, jnp.uint32)

    # warm (compile + first run)
    _force(_gather_loop(table, idx, n_iter, table_rows))
    t0 = time.perf_counter()
    _force(_gather_loop(table, idx, n_iter, table_rows))
    dt = time.perf_counter() - t0
    rows_per_s = n_idx * n_iter / dt
    elems = max(1, slice_w)
    rec = {
        "experiment": "xla_gather",
        "table_rows": table_rows,
        "slice_w": slice_w,
        "dtype": str(dtype),
        "table_mb": round(table_rows * elems * 4 / 1e6, 2),
        "wall_s": round(dt, 3),
        "rows_per_s_M": round(rows_per_s / 1e6, 1),
        "elems_per_s_M": round(rows_per_s * elems / 1e6, 1),
        "bytes_per_s_G": round(rows_per_s * elems * 4 / 1e9, 2),
    }
    print(json.dumps(rec), flush=True)
    return rec


_PRIMES = (1, 2654435761, 805459861)


@functools.partial(jax.jit, static_argnames=("n_iter", "n_levels", "rows"))
def _ngrid_encode_loop(table, pos, scales, n_iter: int, n_levels: int,
                       rows: int):
    """Prototype neighborhood-grid encode: per level ONE gather of a
    [32]-u32 row (a 2x2x2 brick's 3x3x3 cell neighborhood, bf16-feature
    pairs packed), then 8-corner extraction by static-column selects and
    trilinear interpolation on the VPU. 16 descriptors per sample instead
    of the 128 of per-corner hash gathers."""

    def encode_once(shift, acc):
        out = acc
        for lvl in range(n_levels):
            p = pos * scales[lvl] + 0.5
            cell_f = jnp.floor(p)
            frac = p - cell_f
            cell = cell_f.astype(jnp.uint32) + shift
            brick = cell >> jnp.uint32(1)
            off = cell & jnp.uint32(1)  # [3, B] within-brick offset
            h = (brick[0] * jnp.uint32(_PRIMES[0])
                 ^ brick[1] * jnp.uint32(_PRIMES[1])
                 ^ brick[2] * jnp.uint32(_PRIMES[2]))
            row = (h & jnp.uint32(rows - 1)) + jnp.uint32(lvl * rows)
            g = table[row]  # [B, 32] — the single descriptor per sample
            # corner (i,j,k) lives at column (off_x+i)*9+(off_y+j)*3+off_z+k
            # off in {0,1}^3 -> 8 static column patterns selected per lane
            ox, oy, oz = off[0], off[1], off[2]
            for i in (0, 1):
                wx = frac[0] if i else 1.0 - frac[0]
                for j in (0, 1):
                    wy = frac[1] if j else 1.0 - frac[1]
                    for k in (0, 1):
                        wz = frac[2] if k else 1.0 - frac[2]
                        col0 = i * 9 + j * 3 + k          # off = (0,0,0)
                        val = g[:, col0]
                        for px in (0, 1):
                            for py in (0, 1):
                                for pz in (0, 1):
                                    if px == 0 and py == 0 and pz == 0:
                                        continue
                                    c = (px + i) * 9 + (py + j) * 3 + pz + k
                                    m = ((ox == px) & (oy == py)
                                         & (oz == pz))
                                    val = jnp.where(m, g[:, c], val)
                        # unpack bf16 feature pair
                        f0 = jax.lax.bitcast_convert_type(
                            val << jnp.uint32(16), jnp.float32)
                        f1 = jax.lax.bitcast_convert_type(
                            val & jnp.uint32(0xFFFF0000), jnp.float32)
                        w = wx * wy * wz
                        out = out + jnp.sum(w * (f0 + f1))
        return out

    def body(it, acc):
        return encode_once(it.astype(jnp.uint32), acc)

    return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))


def measure_ngrid(rows: int, n_levels: int, n_samples: int, n_iter: int):
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    table = jax.random.randint(k1, (rows * n_levels, 32), 0, 1 << 30,
                               jnp.uint32)
    pos = jax.random.uniform(k2, (3, n_samples), jnp.float32)
    scales = np.asarray(
        [16 * (1.45 ** l) for l in range(n_levels)], np.float32)
    _force(_ngrid_encode_loop(table, pos, scales, n_iter, n_levels, rows))
    t0 = time.perf_counter()
    _force(_ngrid_encode_loop(table, pos, scales, n_iter, n_levels, rows))
    dt = time.perf_counter() - t0
    sps = n_samples * n_iter / dt
    rec = {
        "experiment": "ngrid_encode",
        "rows_per_level": rows,
        "n_levels": n_levels,
        "table_mb": round(rows * n_levels * 128 / 1e6, 1),
        "wall_s": round(dt, 3),
        "samples_per_s_M": round(sps / 1e6, 2),
        "descriptors_per_s_M": round(sps * n_levels / 1e6, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    quick = "--quick" in sys.argv
    ngrid_only = "--ngrid" in sys.argv
    from nerf_tpu.utils.compile_cache import enable as enable_cache

    enable_cache(os.path.join(REPO, ".xla_cache"))

    n_idx = 1 << 22  # 4M indices per iteration
    n_iter = 8 if quick else 48

    if not ngrid_only:
        # 1) slice-width sweep at the hash-level table size (2^19 rows):
        #    if gathers are descriptor-bound, elems/s scales with width
        for w in (0, 1, 2, 4, 8, 16, 32, 64, 128):
            measure_gather(1 << 19, w, n_idx, n_iter)

        # 2) table-size sweep at width 1 (does a small table gather faster?)
        for rows in (1 << 12, 1 << 16, 1 << 19, 1 << 22):
            measure_gather(rows, 1, n_idx, n_iter)

    # 3) neighborhood-grid encode prototype (the T1 redesign candidate):
    #    full 16-level encode rate, one descriptor per sample-level
    measure_ngrid(rows=1 << 14, n_levels=16, n_samples=1 << 20,
                  n_iter=4 if quick else 16)
    measure_ngrid(rows=1 << 16, n_levels=16, n_samples=1 << 20,
                  n_iter=4 if quick else 16)


if __name__ == "__main__":
    main()
