"""nerf_tpu — a TPU-native neural-graphics rendering framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the CUDA
reference renderer (metaverse3d2022/Nerf-Cuda): instant-ngp-style NeRF
inference — hash-grid encoding, fused MLPs, occupancy-grid ray marching,
volume compositing, tonemapping, 2x upsampling, an offline CLI and a TCP
streaming server — re-designed for TPU (static shapes, `jit`/`shard_map`
over device meshes, MXU-friendly batched matmuls, Pallas hot kernels).

Layer map (mirrors reference SURVEY.md section 1, rebuilt TPU-first):
  L0  XLA buffers / jax arrays            (ref: tiny-cuda-nn GPUMemory et al.)
  L1  encodings/ + networks/              (ref: tcnn encodings + MLPs)
  L2  models/                             (ref: include/nerf-cuda/nerf_network.h)
  L3  render/                             (ref: src/nerf_render.cu, render_utils.h)
  L4  buffer/                             (ref: render_buffer.{h,cu}, dlss.cu)
  L5  apps/                               (ref: src/main.cu, src/render_server.cu)
  L6  core/config + core/snapshot         (ref: configs/, msgpack snapshots)
"""

__version__ = "0.1.0"

from nerf_tpu.core.types import Camera, Image, RenderSettings  # noqa: F401
