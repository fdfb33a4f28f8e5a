"""Checkpointing — orbax-backed, with full resume.

Reference parity (/root/reference/src/Multimodal_AUV/train/checkpointing.py):
  * ``save_model(post-like, csv_path, model_type)`` writes to
    ``{dirname(dirname(csv_path))}/models/bayesian_model_type{model_type}``
    (checkpointing.py:7-44's naming, orbax directory instead of .pth).
  * ``load_and_fix_state_dict`` — tolerant restore: leaves whose path is
    unknown or whose shape mismatches are dropped with a warning and the
    rest loaded (checkpointing.py:46-112, incl. the spirit of the
    DataParallel ``module.`` strip, which has no analogue here).

Improvement over the reference (documented divergence, SURVEY.md §5): the
reference never checkpoints optimizer state or epoch, so it cannot truly
resume. ``save_train_state`` / ``restore_train_state`` persist
(posterior, opt_state, batch_stats, step, epoch, scheduler count).
"""
from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


_async_ckptr = None


def _async_checkpointer():
    global _async_ckptr
    import orbax.checkpoint as ocp

    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def wait_for_saves() -> None:
    """Block until every in-flight async checkpoint write has committed.
    Call once at the end of training (the epoch loops do this when
    ``async_checkpoints=True``); a no-op if nothing is in flight."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_pytree(path: str, tree: Any, *, async_save: bool = False) -> str:
    """Save a pytree with orbax's NATIVE array handling: jax.Arrays are
    written shard-by-shard (each process serialises only its addressable
    shards), so saving an FSDP-sharded posterior + Adam moments from a
    multi-host mesh is correct without any host gather. (A previous
    implementation funneled every leaf through np.asarray — fine
    single-process, wrong on a real multi-host mesh where non-addressable
    shards make the gather impossible; round-2 verdict item #3.)

    ``async_save=True`` copies device arrays to host synchronously but
    commits the disk write in orbax's background thread, so a training
    loop's checkpoint cadence does not block on serialization (orbax
    serialises back-to-back async saves internally; call
    ``wait_for_saves()`` before reading the checkpoint or exiting)."""
    path = os.path.abspath(path)
    if jax.process_count() > 1:
        # Sharded multi-host saves are collective: per-process paths would
        # DEADLOCK at the orbax commit rendezvous (each process waiting in
        # its own directory), not error. Fail fast and symmetrically.
        from multimodal_auv_tpu.parallel.distributed import (
            assert_same_across_processes,
        )

        assert_same_across_processes("checkpoint path", path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not async_save:
        # A synchronous save (e.g. the epoch loops' crash-save running with
        # force=True) must not race an in-flight async write to the same
        # directory: two uncoordinated writers delete/rename the same paths,
        # so the older background save could finalize OVER the newer crash
        # state. Drain the async queue first; no-op when nothing is pending.
        wait_for_saves()
    ckptr = _async_checkpointer() if async_save else _checkpointer()
    ckptr.save(path, tree, force=True)
    return path


def restore_pytree(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree. With a ``target`` template whose leaves are
    (possibly sharded) jax.Arrays, each leaf is restored directly INTO the
    template's sharding — every process reads only the shards it owns."""
    import orbax.checkpoint as ocp

    wait_for_saves()  # never read a checkpoint a background save is writing
    if target is not None and jax.process_count() > 1:
        # sharded-template restores are collective too (each process reads
        # the shards it owns) — same uniform-path requirement as save
        from multimodal_auv_tpu.parallel.distributed import (
            assert_same_across_processes,
        )

        assert_same_across_processes("checkpoint path",
                                     os.path.abspath(path))
    ckptr = _checkpointer()
    if target is not None:
        restore_args = ocp.checkpoint_utils.construct_restore_args(target)
        return ckptr.restore(os.path.abspath(path), item=target,
                             restore_args=restore_args)
    return ckptr.restore(os.path.abspath(path))


def model_checkpoint_path(csv_path: str, model_type: str) -> str:
    """{dirname(dirname(csv_path))}/models/bayesian_model_type{model_type}."""
    base = os.path.dirname(os.path.dirname(os.path.abspath(csv_path)))
    return os.path.join(base, "models", f"bayesian_model_type{model_type}")


def save_model(post, csv_path: str, model_type: str,
               async_save: bool = False) -> Optional[str]:
    """Posterior-only checkpoint on the reference's path scheme."""
    try:
        path = model_checkpoint_path(csv_path, model_type)
        save_pytree(path, post, async_save=async_save)
        logger.info("Model checkpoint saved to %s", path)
        return path
    except Exception as e:
        logger.error("Failed to save model checkpoint: %s", e, exc_info=True)
        return None


def load_and_fix_state_dict(post, path: str):
    """Tolerant posterior restore. Returns (new_post, ok: bool)."""
    try:
        raw = restore_pytree(path)
    except Exception as e:
        logger.error("Checkpoint restore failed from %s: %s", path, e)
        return post, False

    def _names(p):
        # Normalise path entries to bare names: orbax's raw restore yields
        # plain DICTS (DictKey, keystr "['mu']") while the flax-struct
        # template flattens with GetAttrKey (keystr ".mu") — comparing raw
        # keystr never matched, silently dropping EVERY leaf while still
        # reporting ok=True.
        return tuple(getattr(k, "name", None) or getattr(k, "key", str(k))
                     for k in p)

    flat_new, treedef = jax.tree_util.tree_flatten_with_path(post)
    raw_by_path = {
        _names(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(raw)[0]
    }
    out, dropped, dropped_paths = [], 0, []
    for p, leaf in flat_new:
        key = _names(p)
        cand = raw_by_path.get(key)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            out.append(jax.numpy.asarray(cand, leaf.dtype))
        else:
            if cand is not None:
                logger.warning("Dropping %s: shape %s != %s", key,
                               np.shape(cand), np.shape(leaf))
            dropped += 1
            dropped_paths.append(key)
            out.append(leaf)
    logger.info("Checkpoint loaded from %s (%d leaves kept, %d dropped)",
                path, len(out) - dropped, dropped)
    if dropped:
        # name the unmatched leaves (not just an aggregate count): a
        # heavily-partial restore keeps the caller's init values for the
        # dropped leaves and would otherwise LOOK successful (ok=True)
        shown = ["/".join(map(str, k)) for k in dropped_paths[:8]]
        logger.warning(
            "Checkpoint %s: %d leaves had no match and keep their input "
            "values: %s%s", path, dropped, ", ".join(shown),
            "" if dropped <= 8 else f", ... (+{dropped - 8} more)")
    if out and dropped == len(out):
        # nothing matched: the caller would silently run on its INPUT
        # (e.g. random-init) posterior believing the checkpoint loaded
        logger.error("Checkpoint at %s matched zero leaves", path)
        return post, False
    return jax.tree_util.tree_unflatten(treedef, out), True


# Dynamic-keyed host metadata (scheduler counts keyed by model_type) can't
# be a pytree subtree directly — orbax template restores require static
# structure — so it is serialised as JSON into a FIXED-capacity uint8
# buffer saved inside the checkpoint pytree. That makes the metadata
# commit atomically with the weights: a previous design wrote a
# ``.meta.json`` sidecar synchronously next to an *async* orbax save,
# leaving a crash window where epoch-N weights could pair with epoch-N+1
# scheduler counts (and a copied checkpoint directory could lose the
# sidecar entirely, silently bypassing the wrong-model-type resume guard).
_META_CAPACITY = 4096


def _encode_meta(meta: Dict[str, Any]) -> np.ndarray:
    raw = json.dumps(meta).encode()
    if len(raw) > _META_CAPACITY:
        raise ValueError(f"checkpoint metadata {len(raw)}B exceeds the "
                         f"{_META_CAPACITY}B buffer")
    buf = np.zeros(_META_CAPACITY, np.uint8)
    buf[:len(raw)] = np.frombuffer(raw, np.uint8)
    return buf


def _decode_meta(buf) -> Dict[str, Any]:
    raw = np.asarray(buf, np.uint8).tobytes().rstrip(b"\x00")
    return json.loads(raw) if raw else {}


def save_train_state(path: str, state, epoch: int,
                     scheduler_counts: Optional[Dict[str, int]] = None,
                     async_save: bool = False) -> str:
    path = os.path.abspath(path)
    # 0-d ndarray, not np scalar: orbax restore-args support
    tree = {"state": state, "epoch": np.asarray(epoch, np.int64),
            "meta": _encode_meta(
                {"scheduler_counts": scheduler_counts or {}})}
    return save_pytree(path, tree, async_save=async_save)


def restore_train_state(path: str, state_template):
    """Returns ``(state, epoch, scheduler_counts)``.

    ``scheduler_counts`` is ``None`` — "no metadata available", distinct
    from an empty dict — when the checkpoint predates the in-pytree meta
    buffer AND its legacy ``.meta.json`` sidecar is missing (e.g. only the
    orbax directory was copied). Resume callers must refuse to proceed in
    that case: without the counts the wrong-model-type guard cannot run
    and the LR schedule would silently restart.
    """
    path = os.path.abspath(path)
    try:
        tree = restore_pytree(path, {"state": state_template,
                                     "epoch": np.zeros((), np.int64),
                                     "meta": np.zeros(_META_CAPACITY,
                                                      np.uint8)})
        counts = _decode_meta(tree["meta"]).get("scheduler_counts", {})
        sched: Optional[Dict[str, int]] = {k: int(v)
                                           for k, v in counts.items()}
    except Exception:
        # legacy checkpoint without the in-pytree meta buffer: restore the
        # old structure and fall back to the sidecar (a genuine
        # state-template mismatch re-raises from this second restore)
        tree = restore_pytree(path, {"state": state_template,
                                     "epoch": np.zeros((), np.int64)})
        meta_path = path + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                sched = {k: int(v) for k, v in
                         json.load(f).get("scheduler_counts", {}).items()}
        else:
            sched = None
    return tree["state"], int(tree["epoch"]), sched
