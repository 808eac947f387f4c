"""Fused NeRF head: density MLP + SH encoding + rgb MLP in one TPU kernel.

Reference parity: tcnn's FullyFusedMLP (src/fully_fused_mlp.cu:48-130) —
the entire MLP runs in one kernel with weights and activations staged in
shared memory, never touching global memory between layers. The TPU
analog keeps the whole chain's activations in VMEM across a block of
samples and runs the matmuls back-to-back on the MXU with fp32
accumulation; we additionally fuse the SH direction encoding and the
sigma extraction (nerf_network.h:148-196) into the same kernel, so one
HBM read of (features, dirs) yields the final (rgb, sigma_raw).

Under plain XLA each jnp.dot is a separate HLO whose [64, B] activations
round-trip HBM — the chain is bandwidth-bound; fused, it is MXU-bound.

Layout: channel-first [C, B] blocks (B on the lane dim), B blocked by
`block_b` via the Pallas grid. Weights live whole in VMEM (a few KB).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.encodings.spherical import sh_basis
from nerf_tpu.networks.mlp import activation_fn


def _make_kernel(n_density_mats: int, n_rgb_mats: int, sh_degree: int,
                 sh_pad_front: int, rgb_input_width: int,
                 density_act: str, density_out_act: str, rgb_act: str,
                 rgb_out_act: str, compute_dtype):
    d_act = activation_fn(density_act)
    d_out_act = activation_fn(density_out_act)
    r_act = activation_fn(rgb_act)
    r_out_act = activation_fn(rgb_out_act)
    cd = compute_dtype

    def mm(w_ref, x):
        return jnp.dot(w_ref[:].astype(cd), x,
                       preferred_element_type=jnp.float32)

    def kernel(*refs):
        h_ref, dir_ref = refs[0], refs[1]
        w_refs = refs[2:2 + n_density_mats + n_rgb_mats]
        out_ref = refs[2 + n_density_mats + n_rgb_mats]
        d_mats = w_refs[:n_density_mats]
        r_mats = w_refs[n_density_mats:]

        # density MLP chain
        h = h_ref[:].astype(cd)
        for w in d_mats[:-1]:
            h = d_act(mm(w, h)).astype(cd)
        d_out = d_out_act(mm(d_mats[-1], h))  # [16, blk] f32

        # SH dir encoding (spherical_harmonics.h:66-150); [0,1] -> [-1,1]
        d2 = dir_ref[:].astype(jnp.float32) * 2.0 - 1.0
        sh_list = sh_basis(d2[0], d2[1], d2[2], sh_degree)
        if sh_pad_front:
            ones = jnp.ones_like(sh_list[0])
            sh_list = [ones] * sh_pad_front + sh_list
        sh = jnp.stack(sh_list, axis=0)

        n_pad = rgb_input_width - d_out.shape[0] - sh.shape[0]
        parts = [d_out.astype(cd), sh.astype(cd)]
        if n_pad > 0:
            parts.append(jnp.zeros((n_pad,) + sh.shape[1:], cd))
        x = jnp.concatenate(parts, axis=0)

        # rgb MLP chain
        for w in r_mats[:-1]:
            x = r_act(mm(w, x)).astype(cd)
        rgb_out = r_out_act(mm(r_mats[-1], x))  # [>=3, blk] f32

        # rows 0..2 rgb, row 3 raw density row 0 (extract_density,
        # nerf_network.h:50-61; sigma activation applied by the caller)
        out_ref[0:3, :] = rgb_out[0:3, :]
        out_ref[3:4, :] = d_out[0:1, :]
        out_ref[4:8, :] = jnp.zeros_like(out_ref[4:8, :])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_density_mats", "sh_degree", "sh_pad_front",
                     "rgb_input_width", "density_act", "density_out_act",
                     "rgb_act", "rgb_out_act", "block_b", "compute_dtype",
                     "interpret"))
def fused_nerf_mlp(h_cf, dir01_cf, weights: Tuple, *,
                   n_density_mats: int,
                   sh_degree: int = 4, sh_pad_front: int = 0,
                   rgb_input_width: int = 32,
                   density_act: str = "ReLU", density_out_act: str = "None",
                   rgb_act: str = "ReLU", rgb_out_act: str = "None",
                   block_b: int = 2048, compute_dtype=jnp.bfloat16,
                   interpret: bool = False):
    """h_cf [h_width, B] hash features, dir01_cf [3, B] dirs in [0,1].

    weights: density matrices then rgb matrices, each [out, in]
    (fully_fused_mlp.cu:662-681 order). Returns out [8, B]: rows 0..2 raw
    rgb, row 3 raw density (pre sigma activation).
    """
    b = h_cf.shape[1]
    blk = min(block_b, b)
    n_blocks = -(-b // blk)
    b_pad = n_blocks * blk - b
    if b_pad:
        h_cf = jnp.pad(h_cf, ((0, 0), (0, b_pad)))
        dir01_cf = jnp.pad(dir01_cf, ((0, 0), (0, b_pad)))
    # pad dir rows 3 -> 4 so the block loads tile cleanly
    dir4 = jnp.pad(dir01_cf, ((0, 1), (0, 0)))

    kernel = _make_kernel(
        n_density_mats, len(weights) - n_density_mats, sh_degree,
        sh_pad_front, rgb_input_width, density_act, density_out_act,
        rgb_act, rgb_out_act, compute_dtype)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((h_cf.shape[0], blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [wspec] * len(weights),
        out_specs=pl.BlockSpec((8, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_blocks * blk), jnp.float32),
        interpret=interpret,
    )(h_cf, dir4, *weights)
    if b_pad:
        out = out[:, :b]
    return out
