"""Persistent XLA compilation cache.

TPU compiles of the whole-frame render program are expensive (minutes via
the remote AOT compiler in this environment); the on-disk cache makes
repeat runs of bench/apps near-instant. The CUDA analog is nvcc's fatbin
cache + tcnn's CudaGraph capture (cuda_graph.h:53).
"""
from __future__ import annotations

import os


def enable(cache_dir: str = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "NERF_TPU_CACHE", os.path.expanduser("~/.cache/nerf_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these knobs
