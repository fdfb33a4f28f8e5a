"""Device mesh + sharding layout — the TPU-native replacement for the
reference's DataParallel (SURVEY.md §2.8).

The reference scales with single-process nn.DataParallel over idle GPUs
(/root/reference/src/Multimodal_AUV/utils/device.py:17-19) and carries dead
DDP branches. Here parallelism is a ``jax.sharding.Mesh`` with two axes:

  * ``data`` — batch data-parallelism (and optional FSDP-style sharding of
    the packed posterior + optimizer state along the flat parameter axis);
  * ``mc``   — Monte-Carlo ensemble parallelism: independent posterior
    weight draws evaluated on different devices, a BNN-specific axis with
    zero analogue in the reference (TP/PP/SP are N/A for this model family
    — SURVEY.md §2.8).

Gradients/metric reductions ride XLA collectives inserted by the SPMD
partitioner from these annotations — no hand-written communication.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_auv_tpu.config import MeshSpec


def make_mesh(spec: Optional[MeshSpec] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if spec is None:
        spec = MeshSpec(data=n, mc=1)
    mc = max(spec.mc, 1)
    data = spec.data if spec.data and spec.data > 0 else max(n // mc, 1)
    use = data * mc
    if use > n:
        raise ValueError(f"mesh {data}x{mc} needs {use} devices, have {n}")
    arr = np.asarray(devices[:use]).reshape(data, mc)
    return Mesh(arr, ("data", "mc"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading batch dimension over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def mc_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (num_mc, P) stack of weight draws over the 'mc' axis."""
    return NamedSharding(mesh, P("mc", None))


def posterior_sharding(mesh: Mesh, fsdp: bool) -> NamedSharding:
    """FSDP-style 1-D sharding of the packed (mu, rho) arrays over both mesh
    axes, or full replication. The flat layout (bayes/packing.py) makes the
    partition trivial; pad_multiple guarantees divisibility when it is a
    multiple of 1024 >= device count."""
    if fsdp:
        return NamedSharding(mesh, P(("data", "mc")))
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """device_put a batch pytree with the leading axis sharded over 'data'."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x)))
        if np.ndim(x) >= 1 else x,
        tree,
    )


def state_shardings(mesh: Mesh, state: Any, fsdp: bool = False) -> Any:
    """The sharding tree shard_state would place ``state`` with: packed
    posterior/opt moments sharded when fsdp, everything else replicated.
    Works on arrays OR ShapeDtypeStructs — the AOT compile-only checks
    attach these to abstract avals (tests/test_flagship_compile.py)."""
    post_shard = posterior_sharding(mesh, fsdp)
    repl = replicated(mesh)

    def place(path, leaf):
        keys = [getattr(p, "name", getattr(p, "key", "")) for p in path]
        # Only a LEAF named mu/rho is a packed array. `any(... in keys)`
        # also matched the Adam state's own `mu` moment FIELD, so the
        # first-moment copies of deterministic BN scale/bias leaves (path
        # ...inner_state/mu/det/.../scale) got FSDP-sharded: device_put
        # raises outright when the BN channel count doesn't divide the
        # device count, and when it does, mu-moments silently sharded
        # while their nu twins stayed replicated.
        is_packed = bool(keys) and keys[-1] in ("mu", "rho")
        if is_packed and np.ndim(leaf) == 1:
            return post_shard
        return repl

    return jax.tree_util.tree_map_with_path(place, state)


def shard_state(mesh: Mesh, state: Any, fsdp: bool = False) -> Any:
    """Place a BayesTrainState (or PackedPosterior) on the mesh: packed
    posterior/opt moments sharded when fsdp, everything else replicated."""
    return jax.tree_util.tree_map(jax.device_put, state,
                                  state_shardings(mesh, state, fsdp))


# ---------------------------------------------------------------------------
# Step wrappers: mesh-enable the production epoch loops
# ---------------------------------------------------------------------------
#
# engine/loops.py feeds its jitted steps host/single-device arrays. These
# wrappers pin the batch arguments to the 'data' sharding per call so the
# SAME epoch loops (CSV ledgers, KL annealing, checkpoint cadence, lagged
# fetch) run data-parallel over the mesh with zero loop changes — the
# pipeline swaps the step callable, nothing else. The reference gets the
# analogous effect from nn.DataParallel wrapping the module
# (/root/reference/src/Multimodal_AUV/utils/device.py:17-19).

def wrap_train_step(mesh: Mesh, step):
    """(state, inputs, labels, mask, key, kl_weight, n) with batch args
    device_put onto the 'data' axis. ``state`` must already be placed via
    shard_state; jit then preserves its shardings across steps."""

    def wrapped(state, inputs, labels, mask, key, kl_weight, n):
        with jax.set_mesh(mesh):
            return step(state,
                        tuple(shard_batch(mesh, a) for a in inputs),
                        shard_batch(mesh, labels), shard_batch(mesh, mask),
                        key, kl_weight, n)

    return wrapped


def wrap_eval_step(mesh: Mesh, step):
    """Mesh twin of wrap_train_step for the eval-step signature
    (post, batch_stats, inputs, labels, mask, key, kl_scale)."""

    def wrapped(post, batch_stats, inputs, labels, mask, key, kl_scale):
        with jax.set_mesh(mesh):
            return step(post, batch_stats,
                        tuple(shard_batch(mesh, a) for a in inputs),
                        shard_batch(mesh, labels), shard_batch(mesh, mask),
                        key, kl_scale)

    return wrapped
