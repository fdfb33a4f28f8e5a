"""Epoch loops + orchestration — parity with train/{multimodal,unimodal,
loop_utils}.py of the reference, driving the jitted steps of steps.py.

Every CSV ledger column set, KL-annealing schedule, checkpoint cadence
(every 5 epochs + crash-save), and scheduler quirk (multimodal double-step
per epoch, unimodal epoch loop starting at 1) is reproduced; true bugs in
the reference are documented at their site.
"""
from __future__ import annotations

import csv
import io
import logging
import os
from pathlib import Path
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_auv_tpu.engine import checkpointing as ckpt
from multimodal_auv_tpu.engine import uncertainty as U
from multimodal_auv_tpu.engine.optim import (
    BayesTrainState,
    StepLR,
    kl_annealing_weight,
    set_learning_rate,
)
from multimodal_auv_tpu.utils.plotting import save_confusion_matrix

logger = logging.getLogger(__name__)


def _patch_size_str(patch_type: Optional[str], kind: str) -> str:
    """'patch_30m_sss' -> '30m' (reference strips prefix/suffix,
    multimodal.py:178-179)."""
    if not patch_type:
        return "none"
    return patch_type.replace("patch_", "").replace(f"_{kind}", "")


def select_patch(batch: Dict, patch_type: Optional[str], kind: str) -> np.ndarray:
    """Reference patch selection (multimodal.py:93-102): look the patch type
    up in the discovered patch dict; fall back to the full-resolution tensor
    ('patch_30_bathy'/'patch_30_sss' alias the full tensors)."""
    from multimodal_auv_tpu.data.datasets import resolve_patch_size

    full = batch["bathy_image"] if kind == "bathy" else batch["sss_image"]
    patches = batch.get(f"patch_{kind}", {}) or {}
    size = resolve_patch_size(patch_type, kind, patches)
    return patches[size] if size is not None else full


def _default_fetch(m):
    """Fetch a step's metrics to host. Prefers the ``fused`` single-array
    bundle; shapes (known without any transfer) give the batch size."""
    if isinstance(m, dict) and "fused" in m:
        from multimodal_auv_tpu.engine.steps import (
            unfuse_eval_metrics,
            unfuse_train_metrics,
        )

        vec = np.asarray(m["fused"])
        if "skipped" in m:  # train-step layout
            return unfuse_train_metrics(vec)
        return unfuse_eval_metrics(vec, m["predicted"].shape[0])
    return jax.device_get(m)


class _LaggedFetch:
    """One-batch-lagged device->host metrics pipeline.

    Reading a scalar from a just-dispatched step blocks the host on the
    device and defeats the prefetch loader's pipelining; holding each batch's
    metrics for one step lets the device run ahead while the host accounts
    for the previous batch. ``push`` returns the *previous* batch's metrics
    (as one bulk device_get) or None; ``flush`` drains the last one."""

    def __init__(self, fetch=None):
        # fetch: metrics -> host dict. The default parses the step's
        # ``fused`` single-array bundle (ONE device->host transfer; a
        # per-leaf device_get costs one round trip per leaf, ~30 ms each on
        # a tunneled TPU), falling back to a bulk device_get for steps
        # without one.
        self._pending = None
        self._fetch = fetch or _default_fetch

    def push(self, item):
        prev, self._pending = self._pending, item
        if prev is None:
            return None
        idx, m = prev
        return idx, self._fetch(m)

    def flush(self):
        prev, self._pending = self._pending, None
        if prev is None:
            return None
        idx, m = prev
        return idx, self._fetch(m)


class _NullCSVWriter:
    """csv.writer stand-in for non-coordinator processes in multi-host
    runs: every process runs the identical epoch loop (the metrics are
    replicated collective outputs), but only process 0 may append ledger
    rows — P identical writers on a shared filesystem would interleave
    duplicate rows. Checkpoint saves are NOT gated: sharded orbax writes
    are collective (engine/checkpointing.py)."""

    def writerow(self, row):
        pass


def _ledger_open(csv_path):
    """Coordinator-gated CSV ledger: (file, writer, write_header).
    Non-coordinator processes in multi-host runs must not even OPEN the
    shared-filesystem path — open(mode="a") CREATES the file, racing the
    coordinator's header-if-new check (the coordinator can then see an
    existing-but-empty file and skip the header row). They get a discarded
    in-memory buffer and a no-op writer instead."""
    if jax.process_index() != 0:
        return io.StringIO(), _NullCSVWriter(), False
    exists = os.path.isfile(csv_path)
    f = open(csv_path, mode="a", newline="")
    return f, csv.writer(f), not exists


def _pad_batch(arrays, labels, nominal: int):
    """Pad ragged final batches to the nominal size; returns mask."""
    n = labels.shape[0]
    mask = np.ones((nominal,), np.float32)
    if n == nominal:
        return arrays, labels, mask
    pad = nominal - n
    mask[n:] = 0.0
    arrays = [np.concatenate([a, np.repeat(a[-1:], pad, 0)]) for a in arrays]
    labels = np.concatenate([labels, np.repeat(labels[-1:], pad, 0)])
    return arrays, labels, mask


def unimodal_input(batch: Dict, model_type: str) -> np.ndarray:
    """unimodal.py:113-122: image->main, sss->sss, bathy->bathy."""
    if model_type == "image":
        return batch["main_image"]
    if model_type == "sss":
        return batch["sss_image"]
    if model_type == "bathy":
        return batch["bathy_image"]
    raise ValueError(f"Unknown model_type: {model_type}")


# ---------------------------------------------------------------------------
# per-epoch train / eval  (multimodal)
# ---------------------------------------------------------------------------

def train_multimodal_model(
    train_step, state: BayesTrainState, dataloader, epoch: int,
    total_num_epochs: int, csv_path: str, model_type: str, sum_writer,
    key: jax.Array, lr: float,
    bathy_patch_type: Optional[str] = None,
    sss_patch_type: Optional[str] = None,
    strict_errors: bool = False,
    async_checkpoints: bool = False,
    stop_check: Optional[Callable[[], bool]] = None,
) -> Tuple[BayesTrainState, float, float]:
    """One training epoch (multimodal.py:25-202). Returns
    (state, train_loss, train_accuracy).

    ``async_checkpoints=True`` commits the 5-epoch-cadence checkpoint in
    orbax's background thread so the next epoch starts immediately
    (crash-saves stay synchronous — the process may be about to die).

    ``strict_errors=False`` (default) is reference parity: any exception
    mid-epoch crash-saves the posterior and returns zero metrics
    (multimodal.py:194-200's bare except). ``True`` still crash-saves but
    RE-RAISES, so a malformed batch cannot silently discard an epoch —
    the same switchable-quirk treatment as ``double_scheduler_step``.

    ``stop_check`` (engine/preemption.py): polled each batch; when it
    turns true the loop breaks at the batch boundary WITHOUT writing the
    epoch CSV row or the 5-epoch-cadence weight dump (a partial-epoch
    posterior must not overwrite a boundary one). The orchestrator then
    skips its epoch-boundary save so the resume checkpoint stays at the
    last completed epoch."""
    csv_path = str(Path(csv_path))
    sss_size = _patch_size_str(sss_patch_type, "sss")
    bathy_size = _patch_size_str(bathy_patch_type, "bathy")
    try:
        csvfile, writer, write_header = _ledger_open(csv_path)
        with csvfile:
            if write_header:
                writer.writerow(["Epoch", "Model type", "Loss", "Accuracy",
                                 "lr", "kl loss", "cross entropy loss",
                                 "SSS Patch Type", "Channel Patch Type"])

            total_loss, correct, total = 0.0, 0.0, 0.0
            # KL weight: 2^(epoch+1)/2^total (multimodal.py:80)
            kl_weight = kl_annealing_weight(epoch, total_num_epochs)
            nominal = dataloader.batch_size
            last_kl, last_ce = 0.0, 0.0
            skipped = 0

            lag = _LaggedFetch()

            def account(done):
                nonlocal total_loss, correct, total, last_kl, last_ce, skipped
                if done is None:
                    return
                j, m = done
                loss = float(m["loss"])
                loss_bad = not np.isfinite(loss)
                if bool(m["skipped"]):
                    skipped += 1
                    logger.warning(
                        "Skipping %s %d due to NaN/Inf",
                        "batch" if loss_bad else "optimizer step for batch", j)
                # kl/ce are computed before the reference's NaN check, so
                # the CSV's last-batch columns update even for a skipped
                # batch (multimodal.py:123-135)
                last_kl, last_ce = float(m["scaled_kl"]), float(m["cross_entropy"])
                if loss_bad:
                    # reference `continue`s BEFORE total_loss/correct/total
                    # and the TB scalar (multimodal.py:133-135): a skipped
                    # batch contributes to neither the accuracy numerator
                    # nor either denominator. (A finite loss with bad grads
                    # only skips the optimizer step and still accumulates,
                    # multimodal.py:141-155.)
                    return
                total_loss += loss
                correct += float(m["correct"])
                total += float(m["total"])
                sum_writer.add_scalar("Loss/train", loss, j)

            preempted = False
            for i, batch in enumerate(dataloader):
                if stop_check is not None and stop_check():
                    logger.warning(
                        "Preemption requested — stopping train epoch %d at "
                        "batch %d (partial-epoch updates are discarded by a "
                        "checkpoint resume)", epoch, i)
                    preempted = True
                    break
                inputs = [np.asarray(batch["main_image"]),
                          np.asarray(select_patch(batch, bathy_patch_type, "bathy")),
                          np.asarray(select_patch(batch, sss_patch_type, "sss"))]
                labels = np.asarray(batch["label"], np.int32)
                inputs, labels, mask = _pad_batch(inputs, labels, nominal)

                key, sub = jax.random.split(key)
                state, m = train_step(state, tuple(jnp.asarray(a) for a in inputs),
                                      jnp.asarray(labels), jnp.asarray(mask),
                                      sub, kl_weight, float(nominal))
                account(lag.push((i, m)))
            account(lag.flush())

            train_accuracy = correct / max(total, 1.0)
            train_loss = total_loss / max(total, 1.0)
            if not preempted:
                logger.info("Epoch %d complete. Loss: %.4f, Accuracy: %.4f, LR: %.6f",
                            epoch + 1, train_loss, train_accuracy, lr)
                writer.writerow([epoch, model_type, train_loss, train_accuracy,
                                 lr, last_kl, last_ce, sss_size, bathy_size])

        # checkpoint every 5 epochs (multimodal.py:189-190); skipped on
        # preemption so a partial-epoch posterior never overwrites a
        # boundary dump
        if epoch % 5 == 0 and not preempted:
            ckpt.save_model(state.post, csv_path,
                            f"{model_type}_bathy_patch{bathy_size}_sss_patch{sss_size}",
                            async_save=async_checkpoints)
        return state, train_loss, train_accuracy
    except Exception:
        # crash-save parity (multimodal.py:194-200)
        ckpt.save_model(state.post, csv_path,
                        f"{model_type}_bathy_patch{bathy_size}_sss_patch{sss_size}")
        logger.error("Error at epoch %d", epoch, exc_info=True)
        if strict_errors:
            raise
        return state, 0.0, 0.0


def evaluate_multimodal_model(
    eval_step, state: BayesTrainState, dataloader, epoch: int,
    total_num_epochs: int, csv_path: str, model_type: str, key: jax.Array,
    bathy_patch_type: Optional[str] = None,
    sss_patch_type: Optional[str] = None,
    class_names=None,
    strict_errors: bool = False,
) -> float:
    """MC evaluation epoch (multimodal.py:204-369). Uses the
    entropy-decomposition uncertainty family; KL scaled by len(dataloader)
    then kl_weight. Returns test_accuracy."""
    csv_path = str(Path(csv_path))
    try:
        csvfile, writer, write_header = _ledger_open(csv_path)
        with csvfile:
            if write_header:
                writer.writerow(["Epoch", "Model Type", "Test Loss",
                                 "Test Accuracy", "Predictive Uncertainty",
                                 "Model Uncertainty", "Scaled KL",
                                 "Cross Entropy Loss", "bathy Patch Type",
                                 "SSS Patch Type"])

            kl_weight = kl_annealing_weight(epoch, total_num_epochs)
            kl_scale = kl_weight / max(len(dataloader), 1)
            nominal = dataloader.batch_size
            total_loss, correct, total = 0.0, 0.0, 0.0
            all_pred, all_lab = [], []
            all_predictive, all_model_unc = [], []
            last_kl, last_ce = 0.0, 0.0

            lag = _LaggedFetch()

            def account(done):
                nonlocal total_loss, correct, total, last_kl, last_ce
                if done is None:
                    return
                (_, labels, valid), m = done
                total_loss += float(m["loss"])
                correct += float(m["correct"])
                total += float(m["total"])
                all_pred.extend(np.asarray(m["predicted"])[:valid])
                all_lab.extend(labels[:valid])
                all_predictive.extend(np.asarray(m["predictive_entropy"])[:valid])
                all_model_unc.extend(np.asarray(m["model_uncertainty"])[:valid])
                last_kl, last_ce = float(m["kl_scaled"]), float(m["cross_entropy"])

            for i, batch in enumerate(dataloader):
                inputs = [np.asarray(batch["main_image"]),
                          np.asarray(select_patch(batch, bathy_patch_type, "bathy")),
                          np.asarray(select_patch(batch, sss_patch_type, "sss"))]
                labels = np.asarray(batch["label"], np.int32)
                valid = labels.shape[0]
                inputs, labels, mask = _pad_batch(inputs, labels, nominal)

                key, sub = jax.random.split(key)
                m = eval_step(state.post, state.batch_stats,
                              tuple(jnp.asarray(a) for a in inputs),
                              jnp.asarray(labels), jnp.asarray(mask), sub,
                              kl_scale)
                account(lag.push(((i, labels, valid), m)))
            account(lag.flush())

            test_accuracy = correct / max(total, 1.0)
            test_loss = total_loss / max(len(dataloader), 1)
            if jax.process_index() == 0:
                save_confusion_matrix(all_lab, all_pred, csv_path,
                                      model_type, epoch, class_names)
            writer.writerow([
                epoch + 1, model_type, test_loss, test_accuracy,
                float(np.mean(all_predictive)) if all_predictive else 0.0,
                float(np.mean(all_model_unc)) if all_model_unc else 0.0,
                last_kl, last_ce,
                bathy_patch_type or "patch_30_bathy",
                sss_patch_type or "patch_30_sss",
            ])
            logger.info("Epoch %d: Test Loss: %.4f, Accuracy: %.4f",
                        epoch + 1, test_loss, test_accuracy)
        return test_accuracy
    except Exception as e:
        logger.error("Critical error at epoch %d: %s", epoch, e, exc_info=True)
        if strict_errors:
            raise
        return 0.0


# ---------------------------------------------------------------------------
# per-epoch train / eval  (unimodal)
# ---------------------------------------------------------------------------

def train_unimodal_model(
    train_step, state: BayesTrainState, dataloader, epoch: int,
    total_num_epochs: int, csv_path: str, model_type: str, sum_writer,
    key: jax.Array, lr: float, strict_errors: bool = False,
    async_checkpoints: bool = False,
    stop_check: Optional[Callable[[], bool]] = None,
) -> Tuple[BayesTrainState, float, float]:
    """One unimodal training epoch (unimodal.py:21-175); CSV columns
    ["Epoch","Model type","Loss","Accuracy","lr"], row logs epoch+1.
    ``stop_check``: see train_multimodal_model — batch-boundary
    preemption break, no row/dump for a partial epoch.

    Returns (state, ACCURACY, LOSS) — the REVERSE of
    train_multimodal_model's (state, loss, accuracy). The swap is the
    reference's own asymmetry (unimodal.py:175 returns (accuracy, loss);
    multimodal.py:202 returns (loss, accuracy)) and is kept for parity —
    bind the outputs by name, never by porting the other loop's
    destructuring."""
    csv_path = str(Path(csv_path))
    try:
        csvfile, writer, write_header = _ledger_open(csv_path)
        with csvfile:
            if write_header:
                writer.writerow(["Epoch", "Model type", "Loss", "Accuracy", "lr"])

            total_loss, correct, total = 0.0, 0.0, 0.0
            kl_weight = kl_annealing_weight(epoch, total_num_epochs)
            nominal = dataloader.batch_size

            lag = _LaggedFetch()

            def account(done):
                nonlocal total_loss, correct, total
                if done is None:
                    return
                j, m = done
                loss = float(m["loss"])
                if np.isfinite(loss):
                    total_loss += loss
                correct += float(m["correct"])
                total += float(m["total"])
                sum_writer.add_scalar("Loss/train", loss, j)

            preempted = False
            for i, batch in enumerate(dataloader):
                if stop_check is not None and stop_check():
                    logger.warning(
                        "Preemption requested — stopping train epoch %d at "
                        "batch %d (partial-epoch updates are discarded by a "
                        "checkpoint resume)", epoch, i)
                    preempted = True
                    break
                inputs = [np.asarray(unimodal_input(batch, model_type))]
                labels = np.asarray(batch["label"], np.int32)
                inputs, labels, mask = _pad_batch(inputs, labels, nominal)

                key, sub = jax.random.split(key)
                state, m = train_step(state, (jnp.asarray(inputs[0]),),
                                      jnp.asarray(labels), jnp.asarray(mask),
                                      sub, kl_weight, float(nominal))
                account(lag.push((i, m)))
            account(lag.flush())

            train_accuracy = correct / max(total, 1.0)
            train_loss = total_loss / max(total, 1.0)
            if not preempted:
                writer.writerow([epoch + 1, model_type, train_loss,
                                 train_accuracy, lr])

        if epoch % 5 == 0 and not preempted:
            ckpt.save_model(state.post, csv_path, model_type,
                            async_save=async_checkpoints)
        return state, train_accuracy, train_loss
    except Exception:
        ckpt.save_model(state.post, csv_path, model_type)
        logger.error("Error at epoch %d", epoch, exc_info=True)
        if strict_errors:
            raise
        return state, 0.0, 0.0


def evaluate_unimodal_model(
    eval_step, state: BayesTrainState, dataloader, epoch: int,
    total_num_epochs: int, csv_path: str, model_type: str, key: jax.Array,
    class_names=None, strict_errors: bool = False,
) -> float:
    """Unimodal MC eval (unimodal.py:178-365): *variance* epistemic
    estimator + mean-entropy aleatoric (eps 1e-7); KL/batch_size; CSV
    ["Epoch","Model Type","Test Loss","Test Accuracy",
    "predictive_uncertainty","model_uncertainty"]."""
    csv_path = str(Path(csv_path))
    try:
        csvfile, writer, write_header = _ledger_open(csv_path)
        with csvfile:
            if write_header:
                writer.writerow(["Epoch", "Model Type", "Test Loss",
                                 "Test Accuracy", "predictive_uncertainty",
                                 "model_uncertainty"])

            kl_weight = kl_annealing_weight(epoch, total_num_epochs)
            nominal = dataloader.batch_size
            kl_scale = kl_weight / nominal  # unimodal.py:272,278
            total_loss, correct, total = 0.0, 0.0, 0.0
            all_pred, all_lab, all_epi, all_alea = [], [], [], []

            lag = _LaggedFetch()

            def account(done):
                nonlocal total_loss, correct, total
                if done is None:
                    return
                (_, labels, valid), m = done
                total_loss += float(m["loss"])
                correct += float(m["correct"])
                total += float(m["total"])
                all_pred.extend(np.asarray(m["predicted"])[:valid])
                all_lab.extend(labels[:valid])
                all_epi.extend(np.asarray(m["epistemic_variance"])[:valid])
                all_alea.extend(np.asarray(m["aleatoric_mc_entropy"])[:valid])

            for i, batch in enumerate(dataloader):
                inputs = [np.asarray(unimodal_input(batch, model_type))]
                labels = np.asarray(batch["label"], np.int32)
                valid = labels.shape[0]
                inputs, labels, mask = _pad_batch(inputs, labels, nominal)

                key, sub = jax.random.split(key)
                m = eval_step(state.post, state.batch_stats,
                              (jnp.asarray(inputs[0]),), jnp.asarray(labels),
                              jnp.asarray(mask), sub, kl_scale)
                account(lag.push(((i, labels, valid), m)))
            account(lag.flush())

            accuracy = correct / max(total, 1.0)
            avg_loss = total_loss / max(total, 1.0)
            if jax.process_index() == 0:
                save_confusion_matrix(all_lab, all_pred, csv_path,
                                      model_type, epoch, class_names)
            writer.writerow([
                epoch + 1, model_type, avg_loss, accuracy,
                float(np.mean(all_epi)) if all_epi else 0.0,
                float(np.mean(all_alea)) if all_alea else 0.0,
            ])
        return accuracy
    except Exception:
        ckpt.save_model(state.post, csv_path, model_type)
        logger.error("Error at epoch %d", epoch, exc_info=True)
        if strict_errors:
            raise
        return 0.0


# ---------------------------------------------------------------------------
# multi-epoch orchestration (loop_utils.py parity)
# ---------------------------------------------------------------------------

def train_and_evaluate_multimodal_model(
    train_loader, test_loader, num_epochs: int, train_step, eval_step,
    state: BayesTrainState, scheduler: StepLR, csv_dir: str,
    sum_writer, key: jax.Array, model_type: str = "multimodal",
    bathy_patch_type: Optional[str] = None,
    sss_patch_type: Optional[str] = None,
    class_names=None,
    double_scheduler_step: bool = True,
    checkpoint_resume_path: Optional[str] = None,
    strict_errors: bool = False,
    async_checkpoints: bool = False,
    preemption_guard=None,
) -> BayesTrainState:
    """loop_utils.py:162-250: for each epoch train -> scheduler.step() ->
    eval -> scheduler.step() *again* (the reference double-steps its StepLR
    every epoch — reproduced by default, switchable via
    ``double_scheduler_step=False``).

    ``preemption_guard`` (engine/preemption.PreemptionGuard, installed by
    the caller): the train loop breaks at the next batch boundary; the
    orchestrator then skips eval and the epoch-boundary save and returns.
    The resume point stays at the last COMPLETED epoch — a signal landing
    between the final batch and the boundary save also discards that
    epoch (conservative: the partial/complete distinction is not
    observable from the flag), which resume replays bit-identically."""
    os.makedirs(csv_dir, exist_ok=True)
    train_csv = os.path.join(csv_dir, "multimodal_train_results.csv")
    eval_csv = os.path.join(csv_dir, "multimodal_eval_results.csv")

    start_epoch = 0
    if checkpoint_resume_path and os.path.exists(checkpoint_resume_path):
        state, start_epoch, sched = ckpt.restore_train_state(
            checkpoint_resume_path, state)
        if sched is None:
            # metadata lost (legacy checkpoint copied without its sidecar):
            # without it the wrong-model guard below can't run and the LR
            # schedule would silently restart from base_lr
            raise ValueError(
                f"checkpoint {checkpoint_resume_path!r} has no scheduler "
                f"metadata — refusing a blind resume (re-save with this "
                f"version, or copy the full checkpoint incl. .meta.json)")
        if model_type not in sched:
            # see the unimodal orchestrator: a wrong-model checkpoint can
            # shape-match and silently skip all training
            raise ValueError(
                f"checkpoint {checkpoint_resume_path!r} was saved for "
                f"model_type(s) {sorted(sched)} — refusing to resume "
                f"{model_type!r} from it (use one resume path per model)")
        scheduler.load_state_dict({"epoch_count": sched[model_type]})
        logger.info("Resumed from %s at epoch %d", checkpoint_resume_path,
                    start_epoch)

    # finally: a strict_errors re-raise (the eval loop has no crash-save
    # that would drain the queue) must not exit with async checkpoint
    # writes still in flight — an unfinalized orbax write would lose the
    # cadence checkpoint the logs already claimed was saved.
    try:
        for epoch in range(start_epoch, num_epochs):
            set_learning_rate(state.opt_state, scheduler.lr)
            # per-epoch keys are folded from the BASE key by epoch index —
            # not threaded through iteration-count splits — and the
            # loaders' shuffle epoch is pinned to the same absolute index,
            # so a run resumed at epoch e (checkpoint_resume_path) replays
            # the exact per-epoch RNG AND batch order of an uninterrupted
            # run: with the restored state + scheduler the trajectories
            # are bit-equal
            # (tests/test_engine.py::test_resume_matches_uninterrupted)
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            k1 = jax.random.fold_in(key, 2 * epoch)
            k2 = jax.random.fold_in(key, 2 * epoch + 1)
            state, train_loss, train_acc = train_multimodal_model(
                train_step, state, train_loader, epoch, num_epochs, train_csv,
                model_type, sum_writer, k1, scheduler.lr,
                bathy_patch_type, sss_patch_type, strict_errors=strict_errors,
                async_checkpoints=async_checkpoints,
                stop_check=(preemption_guard.check
                            if preemption_guard is not None else None))
            if preemption_guard is not None and preemption_guard.triggered:
                logger.warning(
                    "Preempted during epoch %d — stopping without its "
                    "boundary save; resume%s replays it from the last "
                    "completed epoch", epoch,
                    f" ({checkpoint_resume_path})"
                    if checkpoint_resume_path else "")
                break
            scheduler.step()
            test_acc = evaluate_multimodal_model(
                eval_step, state, test_loader, epoch, num_epochs, eval_csv,
                model_type, k2, bathy_patch_type, sss_patch_type, class_names,
                strict_errors=strict_errors)
            if double_scheduler_step:
                scheduler.step()  # loop_utils.py:246 quirk
            sum_writer.add_scalar("Loss/train_epoch", train_loss, epoch)
            sum_writer.add_scalar("Accuracy/val_epoch", test_acc, epoch)
            if checkpoint_resume_path:
                ckpt.save_train_state(checkpoint_resume_path, state, epoch + 1,
                                      {model_type: scheduler.epoch_count},
                                      async_save=async_checkpoints)
            if preemption_guard is not None and preemption_guard.triggered:
                # signal arrived during eval/save: the train epoch DID
                # complete and its boundary save just ran — resume
                # continues at epoch+1
                logger.warning(
                    "Preempted after completed epoch %d — stopping cleanly"
                    "%s", epoch,
                    f"; resume continues from {checkpoint_resume_path}"
                    if checkpoint_resume_path else "")
                break
    finally:
        if async_checkpoints:
            ckpt.wait_for_saves()
    return state


def train_and_evaluate_unimodal_model(
    train_loader, test_loader, num_epochs: int, train_step, eval_step,
    state: BayesTrainState, scheduler: StepLR, csv_dir: str, sum_writer,
    key: jax.Array, model_type: str, class_names=None,
    skip_epoch_zero: bool = True, strict_errors: bool = False,
    async_checkpoints: bool = False,
    checkpoint_resume_path: Optional[str] = None,
    preemption_guard=None,
) -> BayesTrainState:
    """loop_utils.py:65-159. The reference's epoch loop is
    ``range(1, num_epochs)`` — it *skips epoch 0* (an off-by-one,
    SURVEY.md §2.3). Reproduced by default; pass skip_epoch_zero=False for
    the fixed behavior. ``checkpoint_resume_path`` adds the same true
    resume as the multimodal orchestrator (bit-reproducible: epoch-indexed
    keys + pinned shuffle epochs). ``preemption_guard``: cooperative
    SIGTERM stop, same contract as the multimodal orchestrator."""
    os.makedirs(csv_dir, exist_ok=True)
    train_csv = os.path.join(csv_dir, f"unimodal_{model_type}_train_results.csv")
    eval_csv = os.path.join(csv_dir, f"unimodal_{model_type}_eval_results.csv")

    start = 1 if skip_epoch_zero else 0
    if checkpoint_resume_path and os.path.exists(checkpoint_resume_path):
        state, resumed_epoch, sched = ckpt.restore_train_state(
            checkpoint_resume_path, state)
        if sched is None:
            # metadata lost: the cross-modality guard below can't run and
            # the LR schedule would silently restart (see the multimodal
            # orchestrator)
            raise ValueError(
                f"checkpoint {checkpoint_resume_path!r} has no scheduler "
                f"metadata — refusing a blind resume (re-save with this "
                f"version, or copy the full checkpoint incl. .meta.json)")
        if model_type not in sched:
            # the unimodal trunks share parameter shapes (image/bathy are
            # both 3-channel), so resuming modality B from modality A's
            # checkpoint would shape-match, see start >= num_epochs, skip
            # every epoch, and silently return A's weights as B's "result"
            raise ValueError(
                f"checkpoint {checkpoint_resume_path!r} was saved for "
                f"model_type(s) {sorted(sched)} — refusing to resume "
                f"{model_type!r} from it (use one resume path per model)")
        scheduler.load_state_dict({"epoch_count": sched[model_type]})
        start = max(start, resumed_epoch)
        logger.info("Resumed from %s at epoch %d", checkpoint_resume_path,
                    resumed_epoch)
    try:  # see train_and_evaluate_multimodal_model: drain even on re-raise
        for epoch in range(start, num_epochs):
            set_learning_rate(state.opt_state, scheduler.lr)
            # epoch-indexed keys + pinned shuffle epoch (resume-
            # reproducible, see the multimodal orchestrator above)
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            k1 = jax.random.fold_in(key, 2 * epoch)
            k2 = jax.random.fold_in(key, 2 * epoch + 1)
            state, train_acc, train_loss = train_unimodal_model(
                train_step, state, train_loader, epoch, num_epochs, train_csv,
                model_type, sum_writer, k1, scheduler.lr,
                strict_errors=strict_errors,
                async_checkpoints=async_checkpoints,
                stop_check=(preemption_guard.check
                            if preemption_guard is not None else None))
            if preemption_guard is not None and preemption_guard.triggered:
                logger.warning(
                    "Preempted during epoch %d — stopping without its "
                    "boundary save; resume%s replays it from the last "
                    "completed epoch", epoch,
                    f" ({checkpoint_resume_path})"
                    if checkpoint_resume_path else "")
                break
            test_acc = evaluate_unimodal_model(
                eval_step, state, test_loader, epoch, num_epochs, eval_csv,
                model_type, k2, class_names, strict_errors=strict_errors)
            scheduler.step()
            sum_writer.add_scalar(f"Loss/train_{model_type}", train_loss,
                                  epoch)
            sum_writer.add_scalar(f"Accuracy/val_{model_type}", test_acc,
                                  epoch)
            if checkpoint_resume_path:
                ckpt.save_train_state(checkpoint_resume_path, state, epoch + 1,
                                      {model_type: scheduler.epoch_count},
                                      async_save=async_checkpoints)
            if preemption_guard is not None and preemption_guard.triggered:
                # see the multimodal orchestrator: epoch completed, save ran
                logger.warning(
                    "Preempted after completed epoch %d — stopping cleanly"
                    "%s", epoch,
                    f"; resume continues from {checkpoint_resume_path}"
                    if checkpoint_resume_path else "")
                break
    finally:
        if async_checkpoints:
            ckpt.wait_for_saves()
    return state
