"""Multi-host (DCN) scale-out helpers.

The reference tops out at one process with NGPU=2 (common.h:91) — there is
no multi-node story (SURVEY.md section 2.5). Here, multi-host follows the
standard JAX recipe: `jax.distributed.initialize` per host, one global
mesh over all devices, parameters replicated, rays/batches sharded along
the global data axis. Collectives ride ICI within a slice and DCN across
hosts — all inserted by XLA from the sharding specs; no explicit
communication code.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime.

    With explicit arguments a failure RAISES (a misconfigured cluster must
    not silently fall back to single-host); with no arguments, failed env
    autodetection degrades to single-process and returns False."""
    import jax

    explicit = coordinator_address is not None or process_id is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        return True
    except Exception as e:
        if explicit:
            raise
        import warnings

        warnings.warn(f"jax.distributed.initialize skipped: {e}")
        return False


def global_ray_mesh(axis: str = "rays"):
    """1-D mesh over every device in the job (all hosts)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def local_batch_to_global(local_arrays, mesh, axis: str = "rays"):
    """Assemble per-host shards into a global sharded array
    (jax.make_array_from_process_local_data)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_arrays)
