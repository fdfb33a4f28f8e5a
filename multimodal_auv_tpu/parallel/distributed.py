"""Multi-host (multi-process) execution — the DDP-shape equivalent.

The reference carries dormant DistributedDataParallel branches with no
init_process_group anywhere (SURVEY.md §2.8: "DDP: dormant"). The JAX
equivalent is genuinely simple: every host calls
``jax.distributed.initialize``, builds the same global Mesh over all chips
(ICI within a slice, DCN across slices), and runs the *same* pjit program;
collectives are inserted by the SPMD partitioner.

Host-side data loading becomes per-host sharding of the sample index space
(``host_shard_indices``), the analogue of torch's DistributedSampler.
"""
from __future__ import annotations

import logging
from typing import List, Optional, Sequence

import jax

logger = logging.getLogger(__name__)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           initialization_timeout: int = 300) -> int:
    """Initialize multi-host JAX (no-op on a single host). Returns the
    process index. ``initialization_timeout`` covers coordinator
    rendezvous (default raised from jax's 5 min only by being explicit —
    pass a larger value for slow cold-compile fleets)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=initialization_timeout,
        )
        logger.info("Distributed initialized: process %d/%d, %d local / %d "
                    "global devices", jax.process_index(),
                    jax.process_count(), jax.local_device_count(),
                    jax.device_count())
    return jax.process_index()


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Block until every process reaches this barrier, via the coordination
    service (gRPC to the coordinator — NOT a device collective, so it has
    no Gloo/NCCL deadline). Use it to line processes up before the first
    collective of a freshly-compiled program: device-collective context
    creation has a short fixed rendezvous deadline (~30 s for Gloo), and
    per-process compile skew easily exceeds it on cold caches."""
    from jax._src import distributed as _dist

    client = getattr(_dist.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def host_shard_indices(n_samples: int, *, process_index: Optional[int] = None,
                       process_count: Optional[int] = None) -> List[int]:
    """Contiguous per-host shard of the dataset index space (pad-free
    torch-DistributedSampler analogue: the trailing host gets the ragged
    tail, which the padded-batch machinery already handles)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n_samples // pc)
    return list(range(pi * per, min((pi + 1) * per, n_samples)))


def make_global_batch(mesh, per_host_arrays: Sequence):
    """Assemble globally-sharded arrays from per-host shards
    (jax.make_array_from_process_local_data) for multi-host input feeding.
    Axis 0 is always the sharded batch axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return [
        jax.make_array_from_process_local_data(sharding, a)
        for a in per_host_arrays
    ]
