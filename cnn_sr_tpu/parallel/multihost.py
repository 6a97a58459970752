"""Multi-host (multi-process) initialization helpers.

The reference has no distributed story (SURVEY.md §2.5). Here the
framework scales past one host the standard JAX way: one process per
host, ``jax.distributed.initialize`` wires the PJRT clients together,
and every mesh built by ``parallel.mesh.make_mesh`` then spans all
hosts' devices — the data-parallel train step and spatial sharding work
unchanged, with XLA routing collectives over ICI within a slice and DCN
across slices.

Host-local data feeding uses ``jax.make_array_from_process_local_data``
so each host only loads its own shard of the sample set.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent; no-op for
    single-process runs with no coordinator configured).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters.
    """
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        import os

        if "COORDINATOR_ADDRESS" not in os.environ and "TPU_WORKER_HOSTNAMES" not in os.environ:
            return  # single host, nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_host_local_batch(mesh, arr):
    """Build a global batch-sharded array from this process's local
    samples (each host contributes its slice of the batch axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, arr)
