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
import numpy as np

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


def maybe_initialize_distributed(dist_spec=None) -> int:
    """Pipeline entry-point hook: initialize multi-host JAX from an
    explicit ``config.DistSpec``, else from the AUV_COORDINATOR /
    AUV_NUM_PROCESSES / AUV_PROCESS_ID environment (DistSpec.from_env),
    else no-op. MUST run before any device query — the pipelines call it
    before building models or meshes. Returns the process index."""
    from multimodal_auv_tpu.config import DistSpec

    spec = dist_spec if dist_spec is not None else DistSpec.from_env()
    if spec is not None and spec.num_processes > 1:
        return initialize_distributed(
            spec.coordinator, spec.num_processes, spec.process_id,
            initialization_timeout=spec.initialization_timeout)
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


_kv_seq = 0


def assert_same_across_processes(tag: str, value: str,
                                 timeout_ms: int = 600_000) -> None:
    """Fail fast — on EVERY process — when a value that must be
    process-uniform differs across processes. The motivating case is the
    checkpoint directory: a sharded orbax save is a COLLECTIVE (each
    process writes only its addressable shards, then all rendezvous at
    commit), so per-process paths don't error — they deadlock, every
    process waiting in its own directory for commits that land elsewhere.
    This check turns that silent hang into an immediate, symmetric error.

    Mechanism: coordination-service key-value store (gRPC to the
    coordinator — no device collective, no Gloo/NCCL deadline, no compile).
    Every process publishes its value under a per-call sequence key and
    reads everyone else's; all processes therefore agree on the verdict
    and raise together. Requires call-site symmetry (every process reaches
    the same calls in the same order — true for the collective save/restore
    paths that use it). No-op single-process or pre-initialize."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed as _dist

    client = getattr(_dist.global_state, "client", None)
    if client is None:
        return
    global _kv_seq
    _kv_seq += 1
    pi, pc = jax.process_index(), jax.process_count()
    base = f"auv_same/{tag}/{_kv_seq}"
    client.key_value_set(f"{base}/{pi}", value)
    vals = {p: client.blocking_key_value_get(f"{base}/{p}", timeout_ms)
            for p in range(pc)}
    if any(v != value for v in vals.values()):
        raise ValueError(
            f"{tag!r} must be identical on every process (it names a "
            f"collective resource), got {vals} — on a multi-host fleet, "
            f"point every host at the same shared-filesystem path")


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


def is_coordinator() -> bool:
    """True on the process that owns the run's ledgers (CSV rows, TB
    events, manifests, confusion PNGs). Checkpoint saves are NOT gated on
    this — sharded orbax writes are collective (every process serialises
    its addressable shards, engine/checkpointing.py)."""
    return jax.process_index() == 0


def check_multihost_mesh(mesh) -> None:
    """Fail fast on mesh layouts the contiguous per-host batch slicing
    cannot feed. With ``devices[:n].reshape(data, mc)`` (row-major,
    parallel/mesh.py) and each process owning a contiguous device range,
    the 'data' shards owned by process p form the contiguous batch-row
    range ``[p*B/P, (p+1)*B/P)`` exactly when each data-shard's mc
    replicas live within one process — i.e. mc <= local_device_count and
    local_device_count % mc == 0."""
    mc = dict(mesh.shape).get("mc", 1)
    local = jax.local_device_count()
    if mc > local or local % mc:
        raise ValueError(
            f"multi-host mesh with mc={mc} needs mc <= local device count "
            f"({local}) and local % mc == 0, so each MC replica group "
            f"stays on one host and batch rows shard contiguously")


def _host_rows(pi: int, pc: int, a):
    """This process's contiguous row-slice of a global-shaped batch array."""
    a = np.asarray(a)
    per = a.shape[0] // pc
    return a[pi * per:(pi + 1) * per]


# Every process creates the wrappers in the same order (same program), so
# a module-level counter yields process-consistent one-shot barrier names.
_barrier_seq = 0


def _next_barrier_name(kind: str) -> str:
    global _barrier_seq
    _barrier_seq += 1
    return f"auv_{kind}_compiled_{_barrier_seq}"


def _compile_then_rendezvous(step, args, name: str) -> None:
    """AOT-compile the step per-process, then line every process up at a
    coordination-service barrier BEFORE its first collective executes.
    Device-collective context creation has a short fixed rendezvous
    deadline (~30 s for Gloo on CPU), while cold-compile skew between
    hosts easily exceeds it; lower().compile() is process-local and the
    coordination-service barrier (gRPC to the coordinator) has no such
    deadline. Same cure as tests/test_multiprocess.py's round-3 fix, now
    built into the production wrappers."""
    try:
        step.lower(*args).compile()
    except AttributeError:
        pass  # non-jitted step (tests): nothing to pre-compile
    barrier(name)


def wrap_train_step_multihost(mesh, step):
    """Multi-host twin of parallel/mesh.py::wrap_train_step: the epoch
    loops keep their single-process global view (GLOBAL-shaped batches
    from HostShardLoader, global nominal batch size, global masks); this
    wrapper slices out the rows this process owns and assembles the true
    globally-sharded device batch. The METRICS dict is all-gathered to
    full replication before returning: its scalar reductions are
    replicated by construction, but the per-sample ``predicted`` vector
    (and the ``fused`` array that embeds it) stays batch-sharded — the
    epoch loops' host fetch of a cross-process-sharded array raises
    "spans non-addressable devices". The state is NOT gathered (it must
    keep its FSDP shardings). The first call AOT-compiles and rendezvouses
    all processes (see _compile_then_rendezvous)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    pi, pc = jax.process_index(), jax.process_count()
    gather = jax.jit(lambda t: t,
                     out_shardings=NamedSharding(mesh, P()))
    bname = _next_barrier_name("train_step")
    first = [True]

    def to_global(a):
        return make_global_batch(mesh, [_host_rows(pi, pc, a)])[0]

    def wrapped(state, inputs, labels, mask, key, kl_weight, n):
        with jax.set_mesh(mesh):
            args = (state, tuple(to_global(a) for a in inputs),
                    to_global(labels), to_global(mask), key, kl_weight, n)
            if first[0]:
                _compile_then_rendezvous(step, args, bname)
                first[0] = False
            new_state, metrics = step(*args)
            return new_state, gather(metrics)

    return wrapped


def wrap_eval_step_multihost(mesh, step):
    """Eval twin: additionally all-gathers the metrics dict to full
    replication (a jitted identity with replicated out_shardings — the
    SPMD partitioner inserts the collective), because the eval ledgers
    read PER-SAMPLE outputs (predicted class, uncertainties) that are
    otherwise sharded across processes and not host-addressable."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    pi, pc = jax.process_index(), jax.process_count()
    rep = NamedSharding(mesh, P())
    gather = jax.jit(lambda t: t, out_shardings=rep)
    bname = _next_barrier_name("eval_step")
    first = [True]

    def to_global(a):
        return make_global_batch(mesh, [_host_rows(pi, pc, a)])[0]

    def wrapped(post, batch_stats, inputs, labels, mask, key, kl_scale):
        with jax.set_mesh(mesh):
            args = (post, batch_stats, tuple(to_global(a) for a in inputs),
                    to_global(labels), to_global(mask), key, kl_scale)
            if first[0]:
                _compile_then_rendezvous(step, args, bname)
                first[0] = False
            return gather(step(*args))

    return wrapped
