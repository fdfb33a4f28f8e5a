"""Unimodal pipelines — BNN classification per single modality.

Covers BASELINE.json configs[0] ("Unimodal optical-image BNN inference,
10 MC samples") and configs[1] ("Unimodal sidescan-sonar patch BNN
classification, train + eval, metrics CSV"), built from the reference's
train/unimodal.py engines (the reference exposes no unimodal CLI; its
main.py research driver trains unimodal models — main.py:94-184).
"""
from __future__ import annotations

import csv
import logging
import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.data.loaders import prepare_datasets_and_loaders
from multimodal_auv_tpu.engine import uncertainty as U
from multimodal_auv_tpu.engine.loops import (
    train_and_evaluate_unimodal_model,
    unimodal_input,
)
from multimodal_auv_tpu.engine.mc import mc_logits
from multimodal_auv_tpu.engine.optim import BayesTrainState, StepLR, make_optimizer
from multimodal_auv_tpu.engine.steps import make_eval_step, make_train_step
from multimodal_auv_tpu.models.model_utils import (
    ArchConfig,
    ModelBundle,
    make_unimodal_bundle,
)
from multimodal_auv_tpu.utils.tb import SummaryWriter

logger = logging.getLogger(__name__)

_CHANNELS = {"image": 3, "bathy": 3, "sss": 1}


def unimodal_predict_and_save(
    bundle: ModelBundle,
    dataloader: Iterable,
    csv_path: str,
    num_mc_samples: int = 10,
    *,
    model_type: str = "image",
    key: Optional[jax.Array] = None,
    mc_chunk: int = 1,
    fast_sampling: Optional[bool] = None,
    bn_mode: str = "train",
) -> str:
    """MC inference for one modality; CSV schema mirrors the multimodal
    predictor (predictors.py:33): variance-estimator predictive uncertainty
    + mean-entropy aleatoric (eps 1e-7).

    ``fast_sampling``: same tri-state as the multimodal path (None = auto,
    engine/mc.py::_resolve_fast) — this path samples f32 without split
    consumption so auto resolves OFF; the explicit switch exists so a
    production-output debug session can force either generator uniformly
    across every predict surface (docs/CLI.md).

    ``bn_mode``: "train" (reference-faithful) or "eval" (frozen running
    BN statistics) — see engine/predict.py::make_predict_step."""
    if bn_mode not in ("train", "eval"):
        raise ValueError(f"bn_mode must be 'train' or 'eval', got {bn_mode!r}")
    if key is None:
        key = jax.random.PRNGKey(0)
    module, meta = bundle.module, bundle.meta

    @jax.jit
    def step(post, batch_stats, x, k, mask=None):
        # mask excludes padded ragged-tail rows from train-mode BN
        # statistics, so real rows equal an unpadded run (the reference
        # never pads) — same fix as the multimodal predict path
        logits = mc_logits(module, meta, post, batch_stats, (x,), k,
                           num_mc_samples, mc_chunk=mc_chunk,
                           train=(bn_mode == "train"),
                           remat=False, batch_mask=mask,
                           fast_sampling=fast_sampling)
        probs = U.softmax_probs(logits)
        # one fused (3, batch) array -> a single D2H fetch per batch
        return jnp.stack([
            U.predicted_class(probs).astype(jnp.float32),
            U.variance_uncertainty(probs).astype(jnp.float32),
            U.aleatoric_uncertainty(probs, eps=1e-7).astype(jnp.float32)])

    nominal = None
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Image Name", "Predicted Class", "Predictive Uncertainty",
                    "Aleatoric Uncertainty"])
        pending = None

        def _drain(p):
            # one-batch lag: the D2H round trip overlaps the next batch's
            # compute (same loop shape as engine/predict.py)
            out, names, valid = p
            cols = np.asarray(out)
            for i in range(valid):
                name = names[i] if i < len(names) else f"sample_{i}"
                w.writerow([name, int(cols[0, i]), float(cols[1, i]),
                            float(cols[2, i])])

        for batch in dataloader:
            if isinstance(batch, dict):
                x = np.asarray(unimodal_input(batch, model_type))
                names = batch.get("name", [f"sample_{i}" for i in
                                           range(x.shape[0])])
            else:
                main, bathy, sss, names = batch
                x = np.asarray({"image": main, "bathy": bathy,
                                "sss": sss}[model_type])
            valid = x.shape[0]
            if nominal is None:
                nominal = valid
            mask = np.ones((nominal,), np.float32)
            if valid < nominal:
                mask[valid:] = 0.0
                x = np.concatenate([x, np.repeat(x[-1:], nominal - valid, 0)])
            key, sub = jax.random.split(key)
            out = step(bundle.post, bundle.batch_stats, jnp.asarray(x), sub,
                       jnp.asarray(mask))
            if pending is not None:
                _drain(pending)
            pending = (out, names, valid)
        if pending is not None:
            _drain(pending)
    logger.info("Unimodal %s inference written to %s", model_type, csv_path)
    return csv_path


def run_unimodal_training(
    root_dir: str,
    model_type: str = "sss",
    num_epochs: int = 10,
    num_mc: int = 5,
    batch_size: int = 8,
    lr: float = 1e-5,
    weight_decay: float = 1e-5,
    scheduler_step_size: int = 5,
    scheduler_gamma: float = 0.571,
    num_classes: int = 0,
    *,
    csv_dir: Optional[str] = None,
    arch: Optional[ArchConfig] = None,
    mc_chunk: int = 1,
    seed: int = 0,
    skip_epoch_zero: bool = True,
    strict_errors: bool = False,
    async_checkpoints: bool = False,
    resume_checkpoint: Optional[str] = None,
    handle_preemption: bool = True,
    preemption_guard=None,
    mesh_spec=None,
    dist_spec=None,
) -> BayesTrainState:
    """Train + evaluate one unimodal BNN (metrics CSVs + confusion
    matrices), the configs[1] workload. ``resume_checkpoint`` enables the
    same preemption-reproducible true resume as the multimodal pipeline;
    ``handle_preemption`` installs the cooperative SIGTERM stop
    (engine/preemption.py). ``mesh_spec`` (config.MeshSpec) trains
    data-parallel over a device mesh with optional FSDP posterior sharding
    and 'mc' ensemble parallelism — same contract as the multimodal
    pipeline (pipelines/training.py). ``dist_spec`` (config.DistSpec or
    AUV_* env): multi-host launch — same contract as
    run_AUV_training_from_scratch. ``strict_errors``/``async_checkpoints``
    propagate to the epoch loops — same quirk switches as the multimodal
    pipeline (strict_errors=False keeps the reference's swallow-into-zeros
    crash-save behavior; True re-raises after the crash-save)."""
    from multimodal_auv_tpu.parallel.distributed import (
        is_coordinator,
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed(dist_spec)
    multihost = jax.process_count() > 1
    if multihost and mesh_spec is None:
        raise ValueError(
            "multi-host training requires a mesh_spec (the global batch "
            "must be sharded over a 'data' mesh axis spanning all hosts)")
    arch = arch or ArchConfig()
    spec = BNNPriorSpec()
    (tl, te, _, _, actual_classes, dataset) = prepare_datasets_and_loaders(
        root_dir, batch_size_unimodal=batch_size,
        image_size=arch.image_size)
    if num_classes in (None, 0):
        num_classes = actual_classes

    bundle = make_unimodal_bundle(_CHANNELS[model_type], num_classes, spec,
                                  jax.random.PRNGKey(seed), arch)
    tx = make_optimizer(lr, weight_decay)

    mesh = None
    ws_sharding = None
    if mesh_spec is not None:  # see pipelines/training.py — same contract
        from multimodal_auv_tpu.parallel import mesh as M

        mesh = M.make_mesh(mesh_spec)
        if batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size ({batch_size}) must be divisible by the mesh "
                f"'data' axis ({mesh.shape['data']})")
        if mesh.shape["mc"] > 1:
            if mc_chunk % mesh.shape["mc"]:
                logger.info("mesh mc=%d: raising mc_chunk %d -> %d so each "
                            "sampled chunk spans the ensemble axis",
                            mesh.shape["mc"], mc_chunk, mesh.shape["mc"])
                mc_chunk = mesh.shape["mc"]
            if num_mc % mc_chunk:
                raise ValueError(
                    f"num_mc ({num_mc}) must be divisible by the mc chunk "
                    f"({mc_chunk}) under an mc={mesh.shape['mc']} mesh")
            ws_sharding = M.mc_sharding(mesh)

    state = BayesTrainState(post=bundle.post, opt_state=tx.init(bundle.post),
                            batch_stats=bundle.batch_stats,
                            step=jnp.zeros((), jnp.int32))
    tstep = make_train_step(bundle.module, bundle.meta, spec, tx,
                            num_mc=num_mc, mc_chunk=mc_chunk,
                            ws_sharding=ws_sharding)
    estep = make_eval_step(bundle.module, bundle.meta, spec, num_mc=num_mc,
                           mc_chunk=mc_chunk, ws_sharding=ws_sharding)
    if mesh is not None:
        from multimodal_auv_tpu.parallel import mesh as M

        state = M.shard_state(mesh, state,
                              fsdp=bool(getattr(mesh_spec, "fsdp", False)))
        if multihost:
            from multimodal_auv_tpu.data.loaders import HostShardLoader
            from multimodal_auv_tpu.parallel.distributed import (
                check_multihost_mesh,
                wrap_eval_step_multihost,
                wrap_train_step_multihost,
            )

            check_multihost_mesh(mesh)
            tl = HostShardLoader.from_loader(tl)
            te = HostShardLoader.from_loader(te)
            tstep = wrap_train_step_multihost(mesh, tstep)
            estep = wrap_eval_step_multihost(mesh, estep)
            logger.info(
                "Multi-host unimodal training: process %d/%d, mesh %s "
                "(fsdp=%s), each host feeds %d of every %d-row batch",
                jax.process_index(), jax.process_count(), dict(mesh.shape),
                getattr(mesh_spec, "fsdp", False), tl.rows_per_host,
                batch_size)
        else:
            tstep = M.wrap_train_step(mesh, tstep)
            estep = M.wrap_eval_step(mesh, estep)
            logger.info("Unimodal training on mesh %s (fsdp=%s)",
                        dict(mesh.shape), getattr(mesh_spec, "fsdp", False))
    csv_dir = csv_dir or os.path.join(root_dir, "csvs")
    from multimodal_auv_tpu.utils.manifest import write_run_manifest

    if is_coordinator():
        write_run_manifest(csv_dir, "unimodal_training", {
            "root_dir": root_dir, "model_type": model_type,
            "num_epochs": num_epochs, "num_mc": num_mc,
            "batch_size": batch_size, "lr": lr, "weight_decay": weight_decay,
            "scheduler_step_size": scheduler_step_size,
            "scheduler_gamma": scheduler_gamma, "num_classes": num_classes,
            "seed": seed, "mc_chunk": mc_chunk,
            "skip_epoch_zero": skip_epoch_zero,
            "strict_errors": strict_errors,
            "async_checkpoints": async_checkpoints,
            "resume_checkpoint": resume_checkpoint,
            "mesh": (dict(data=mesh_spec.data, mc=mesh_spec.mc,
                          fsdp=mesh_spec.fsdp)
                     if mesh_spec is not None else None),
            "num_processes": jax.process_count(),
        })
    from multimodal_auv_tpu.utils.tb import NullSummaryWriter

    sw = (SummaryWriter(os.path.join(csv_dir, "tb"))
          if is_coordinator() else NullSummaryWriter())
    from multimodal_auv_tpu.engine.preemption import maybe_guard, null_guard

    own = null_guard() if preemption_guard is not None else None
    with (own if own is not None else maybe_guard(handle_preemption)) as g:
        guard = preemption_guard if preemption_guard is not None else g
        state = train_and_evaluate_unimodal_model(
            tl, te, num_epochs, tstep, estep, state,
            StepLR(lr, scheduler_step_size, scheduler_gamma), csv_dir, sw,
            jax.random.PRNGKey(seed + 1), model_type=model_type,
            class_names=list(dataset.label_encoder.classes_),
            skip_epoch_zero=skip_epoch_zero,
            strict_errors=strict_errors,
            async_checkpoints=async_checkpoints,
            checkpoint_resume_path=resume_checkpoint,
            preemption_guard=guard)
    if guard.triggered:
        logger.warning(
            "Unimodal training preempted (SIGTERM). %s",
            f"Resume with resume_checkpoint={resume_checkpoint!r}."
            if resume_checkpoint else
            "Pass resume_checkpoint= to make preempted runs resumable.")
    bundle.post = state.post
    bundle.batch_stats = state.batch_stats
    return state
