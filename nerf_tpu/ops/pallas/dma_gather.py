"""Pallas DMA row-gather experiment.

The question (BASELINE.md roofline, VERDICT r1 #3): can a hand-written
Pallas kernel beat XLA's gather descriptor rate (~125M rows/s on v5e) by
issuing row DMAs itself? Each index costs one `make_async_copy` start —
the scalar core's DMA issue rate is the limit, double-buffered so waits
overlap with the next start.

Measured result lives in BASELINE.md; this file stays as the experiment
record + a usable kernel for row-gather workloads.

Reference analog: the hash-table row fetches of kernel_grid
(dependencies/tiny-cuda-nn/include/tiny-cuda-nn/encodings/grid.h:139-311),
which on GPU ride the L2 cache instead of DMA descriptors.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 512      # index block minor dim (SMEM layout constraint)
_ROWS = 8         # index block rows -> 4096 indices per grid step
_STEP = _LANES * _ROWS
_NBUF = 16        # DMA slots in flight


def _kernel(idx_ref, table_ref, out_ref, sems):
    """idx_ref: SMEM [ROWS, LANES] int32 block (4096 indices);
    table_ref: HBM [R, W]; out_ref: VMEM [STEP, W] gathered rows.

    DMAs go straight into the output row (no staging copy); semaphore
    slots recycle every _NBUF issues."""

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            table_ref.at[idx_ref[i // _LANES, jax.lax.rem(i, _LANES)]],
            out_ref.at[i],
            sems.at[slot],
        )

    def body(i, _):
        slot = jax.lax.rem(i, _NBUF)

        @pl.when(i >= _NBUF)
        def _():
            get_dma(slot, i - _NBUF).wait()

        get_dma(slot, i).start()
        return 0

    jax.lax.fori_loop(0, _STEP, body, 0)

    def drain(i, _):
        get_dma(jax.lax.rem(i, _NBUF), i).wait()
        return 0

    jax.lax.fori_loop(_STEP - _NBUF, _STEP, drain, 0)


@functools.partial(jax.jit, static_argnames=())
def dma_gather_rows(table, idx):
    """Gather rows of `table` [R, W] at `idx` [N] via per-row Pallas DMAs.

    N must be a multiple of 4096. Returns [N, W]."""
    n = idx.shape[0]
    w = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n // _STEP,),
        in_specs=[
            pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec((_STEP, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
    )(idx.astype(jnp.int32).reshape(n // _STEP * _ROWS, _LANES), table)
