"""run_AUV_training_from_scratch + run_auv_retraining pipelines.

References:
  * /root/reference/src/Multimodal_AUV/functions/functions.py:361-546
    (from-scratch: define models, Adam+StepLR, multimodal train loop).
  * functions.py:84-258 (retraining: HF weights + head swap, then the same
    loop). Note: the reference builds its optimizer over a *fresh*
    define_models dict instead of the loaded model (functions.py:229-235) —
    a real bug (the loaded weights are never optimized); fixed here, the
    optimizer always owns the trained posterior.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.data.loaders import prepare_datasets_and_loaders
from multimodal_auv_tpu.engine.loops import train_and_evaluate_multimodal_model
from multimodal_auv_tpu.engine.optim import BayesTrainState, StepLR, make_optimizer
from multimodal_auv_tpu.engine.steps import make_eval_step, make_train_step
from multimodal_auv_tpu.interop import hub
from multimodal_auv_tpu.models.model_utils import ArchConfig, make_multimodal_bundle
from multimodal_auv_tpu.utils.logging_utils import setup_pipeline_logging
from multimodal_auv_tpu.utils.tb import SummaryWriter

logger = logging.getLogger(__name__)


def _patch_type(base, kind: str) -> Optional[str]:
    if base is None:
        return None
    return f"patch_{base}_{kind}" if not str(base).startswith("patch_") else str(base)


def _train_multimodal_common(
    *,
    root_dir: str,
    bundle,
    num_classes: int,
    lr: float,
    weight_decay: float,
    num_epochs: int,
    num_mc: int,
    batch_size_multimodal: int,
    scheduler_step_size: int,
    scheduler_gamma: float,
    bathy_patch_base,
    sss_patch_base,
    spec: BNNPriorSpec,
    mc_chunk: int = 1,
    seed: int = 0,
    double_scheduler_step: bool = True,
    resume_checkpoint: Optional[str] = None,
    freeze_backbone: bool = False,
    bf16_weights: bool = False,
    use_packed_loader: bool = False,
    image_size: Optional[int] = None,
    strict_errors: bool = False,
    async_checkpoints: bool = False,
    handle_preemption: bool = True,
    preemption_guard=None,
    mesh_spec=None,
    remat: str = "on",
):
    from multimodal_auv_tpu.parallel.distributed import is_coordinator
    from multimodal_auv_tpu.utils.tb import NullSummaryWriter

    log_dir = setup_pipeline_logging()
    # multi-host: process 0 owns every ledger (TB events, manifest, CSV
    # rows via engine/loops._ledger_writer); checkpoints stay collective
    multihost = jax.process_count() > 1
    sum_writer = (SummaryWriter(os.path.join("tensorboard_logs",
                                             os.path.basename(log_dir)))
                  if is_coordinator() else NullSummaryWriter())
    if multihost and mesh_spec is None:
        raise ValueError(
            "multi-host training requires a mesh_spec (the global batch "
            "must be sharded over a 'data' mesh axis spanning all hosts)")

    if use_packed_loader:
        # decode-once epochs: uint8 memmap batches, normalize on-chip
        from multimodal_auv_tpu.data.loaders import (
            prepare_packed_train_loaders,
        )

        (train_loader, test_loader, actual_num_classes, dataset) = (
            prepare_packed_train_loaders(
                root_dir, batch_size_multimodal,
                bathy_patch_type=_patch_type(bathy_patch_base, "bathy"),
                sss_patch_type=_patch_type(sss_patch_base, "sss"),
                seed=seed, image_size=image_size))
    else:
        (_, _, train_loader, test_loader, actual_num_classes, dataset) = (
            prepare_datasets_and_loaders(
                root_dir, batch_size_multimodal=batch_size_multimodal,
                image_size=image_size))
    if num_classes in (None, 0):
        num_classes = actual_num_classes
    elif num_classes != actual_num_classes:
        logger.warning("Configured num_classes (%d) differs from detected (%d); "
                       "using configured.", num_classes, actual_num_classes)

    if freeze_backbone:
        from multimodal_auv_tpu.engine.optim import (
            make_backbone_freeze_mask,
            make_optimizer_with_freeze,
        )

        mask = make_backbone_freeze_mask(bundle.meta, bundle.post)
        tx = make_optimizer_with_freeze(lr, weight_decay, mask)
    else:
        tx = make_optimizer(lr, weight_decay)

    # Multi-device training (SURVEY §2.8 — the production replacement for
    # the reference's nn.DataParallel wrap, utils/device.py:17-19): batch
    # DP over the 'data' axis, optional FSDP posterior/Adam-moment sharding,
    # optional MC-ensemble parallelism over 'mc'. The epoch loops are
    # untouched — the steps are wrapped so every batch is pinned to the
    # mesh, and the state is placed once up front.
    mesh = None
    ws_sharding = None
    if mesh_spec is not None:
        from multimodal_auv_tpu.parallel import mesh as M

        mesh = M.make_mesh(mesh_spec)
        dp = mesh.shape["data"]
        mc_ax = mesh.shape["mc"]
        if batch_size_multimodal % dp:
            raise ValueError(
                f"batch_size ({batch_size_multimodal}) must be divisible by "
                f"the mesh 'data' axis ({dp}) — every (padded) batch is "
                f"split evenly across data shards")
        if mc_ax > 1:
            if mc_chunk % mc_ax:
                logger.info("mesh mc=%d: raising mc_chunk %d -> %d so each "
                            "sampled chunk spans the ensemble axis",
                            mc_ax, mc_chunk, mc_ax)
                mc_chunk = mc_ax
            if num_mc % mc_chunk:
                raise ValueError(
                    f"num_mc ({num_mc}) must be divisible by the mc chunk "
                    f"({mc_chunk}) under an mc={mc_ax} mesh")
            ws_sharding = M.mc_sharding(mesh)

    state = BayesTrainState(post=bundle.post, opt_state=tx.init(bundle.post),
                            batch_stats=bundle.batch_stats,
                            step=jnp.zeros((), jnp.int32))
    train_step = make_train_step(
        bundle.module, bundle.meta, spec, tx, num_mc=num_mc,
        mc_chunk=mc_chunk,
        sample_dtype=jnp.bfloat16 if bf16_weights else None,
        packed_inputs=use_packed_loader, ws_sharding=ws_sharding,
        remat=remat)
    eval_step = make_eval_step(bundle.module, bundle.meta, spec,
                               num_mc=num_mc, mc_chunk=mc_chunk,
                               packed_inputs=use_packed_loader,
                               ws_sharding=ws_sharding)
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
            if use_packed_loader:
                # decode-once memmap path: each host reads only its
                # 1/P row-slice of every batch (cache creation was
                # single-writer inside prepare_packed_train_loaders)
                from multimodal_auv_tpu.data.packing import (
                    HostShardPackedBatches,
                )

                train_loader = HostShardPackedBatches.from_batches(
                    train_loader)
                test_loader = HostShardPackedBatches.from_batches(test_loader)
            else:
                train_loader = HostShardLoader.from_loader(train_loader)
                test_loader = HostShardLoader.from_loader(test_loader)
            train_step = wrap_train_step_multihost(mesh, train_step)
            eval_step = wrap_eval_step_multihost(mesh, eval_step)
            logger.info(
                "Multi-host training: process %d/%d, mesh %s (fsdp=%s), "
                "each host feeds %d of every %d-row batch",
                jax.process_index(), jax.process_count(), dict(mesh.shape),
                getattr(mesh_spec, "fsdp", False),
                train_loader.rows_per_host, batch_size_multimodal)
        else:
            train_step = M.wrap_train_step(mesh, train_step)
            eval_step = M.wrap_eval_step(mesh, eval_step)
            logger.info("Training on mesh %s (fsdp=%s)", dict(mesh.shape),
                        getattr(mesh_spec, "fsdp", False))
    scheduler = StepLR(lr, scheduler_step_size, scheduler_gamma)

    class_names = list(dataset.label_encoder.classes_)
    from multimodal_auv_tpu.utils.manifest import write_run_manifest

    manifest = {
        "root_dir": root_dir, "num_classes": num_classes, "lr": lr,
        "weight_decay": weight_decay, "num_epochs": num_epochs,
        "num_mc": num_mc, "batch_size": batch_size_multimodal,
        "scheduler_step_size": scheduler_step_size,
        "scheduler_gamma": scheduler_gamma,
        "bathy_patch_base": bathy_patch_base,
        "sss_patch_base": sss_patch_base, "seed": seed,
        "mc_chunk": mc_chunk, "double_scheduler_step": double_scheduler_step,
        "resume_checkpoint": resume_checkpoint,
        "freeze_backbone": freeze_backbone, "bf16_weights": bf16_weights,
        "use_packed_loader": use_packed_loader, "image_size": image_size,
        "strict_errors": strict_errors,
        "async_checkpoints": async_checkpoints,
        "remat": remat,
        "class_names": class_names,
        "mesh": (dict(data=mesh_spec.data, mc=mesh_spec.mc,
                      fsdp=mesh_spec.fsdp) if mesh_spec is not None else None),
        "num_processes": jax.process_count(),
    }
    if is_coordinator():
        write_run_manifest(os.path.join(root_dir, "csvs"),
                           "multimodal_training", manifest)
    # preemptible-fleet realism (engine/preemption.py): SIGTERM stops at
    # the next batch boundary, drains async saves, and leaves the resume
    # checkpoint at the last completed epoch
    from multimodal_auv_tpu.engine.preemption import maybe_guard, null_guard

    # an externally-entered guard (e.g. the CLI's, which turns it into
    # exit code 75) takes precedence over installing our own
    own = null_guard() if preemption_guard is not None else None
    with (own if own is not None else maybe_guard(handle_preemption)) as g:
        guard = preemption_guard if preemption_guard is not None else g
        state = train_and_evaluate_multimodal_model(
            train_loader, test_loader, num_epochs, train_step, eval_step,
            state, scheduler, os.path.join(root_dir, "csvs"), sum_writer,
            jax.random.PRNGKey(seed),
            bathy_patch_type=_patch_type(bathy_patch_base, "bathy"),
            sss_patch_type=_patch_type(sss_patch_base, "sss"),
            class_names=class_names,
            double_scheduler_step=double_scheduler_step,
            checkpoint_resume_path=resume_checkpoint,
            strict_errors=strict_errors,
            async_checkpoints=async_checkpoints,
            preemption_guard=guard,
        )
    if guard.triggered:
        logger.warning(
            "Training preempted (SIGTERM). %s",
            f"Resume with resume_checkpoint={resume_checkpoint!r}."
            if resume_checkpoint else
            "Pass resume_checkpoint= to make preempted runs resumable.")
    sum_writer.close()
    bundle.post = state.post
    bundle.batch_stats = state.batch_stats
    return state


def run_AUV_training_from_scratch(
    const_bnn_prior_parameters: Dict[str, Any],
    lr_multimodal_model: float,
    num_epochs_multimodal: int,
    num_mc: int,
    bathy_patch_base_raw: int,
    sss_patch_base_raw: int,
    batch_size_multimodal: int,
    root_dir: str,
    devices: Optional[List] = None,
    num_classes: int = 0,
    *,
    arch: Optional[ArchConfig] = None,
    mc_chunk: int = 1,
    seed: int = 0,
    weight_decay: float = 1e-5,
    scheduler_step_size: int = 7,
    scheduler_gamma: float = 0.752,
    resume_checkpoint: Optional[str] = None,
    pretrained_trunks: Optional[str] = None,
    bf16_weights: bool = False,
    use_packed_loader: bool = False,
    strict_errors: bool = False,
    async_checkpoints: bool = False,
    handle_preemption: bool = True,
    preemption_guard=None,
    mesh_spec=None,
    dist_spec=None,
    remat: str = "on",
) -> bool:
    """Signature parity with functions.py:361-374 (``devices`` accepted for
    API compatibility; placement is mesh-driven on TPU).

    ``pretrained_trunks``: optional path to a torchvision-*named* ResNet-50
    state dict; MOPED-initialises all three feature trunks — the offline
    equivalent of the reference's IMAGENET1K_V1 download
    (models/model_utils.py:26-64).

    ``dist_spec`` (config.DistSpec, or AUV_* env vars): multi-host launch
    — every host runs this same call; jax.distributed is initialized
    before any device query, the mesh spans all hosts' chips, each host
    decodes 1/P of every batch, and only process 0 writes ledgers."""
    try:
        from multimodal_auv_tpu.parallel.distributed import (
            maybe_initialize_distributed,
        )

        maybe_initialize_distributed(dist_spec)
        spec = (BNNPriorSpec.from_dict(const_bnn_prior_parameters)
                if isinstance(const_bnn_prior_parameters, dict)
                else const_bnn_prior_parameters)
        arch = arch or ArchConfig()
        # peek at the dataset for num_classes before building the model
        if num_classes in (None, 0):
            from multimodal_auv_tpu.data.datasets import MultimodalFolderDataset

            num_classes = MultimodalFolderDataset(root_dir).num_classes
        bundle = make_multimodal_bundle(num_classes, spec,
                                        jax.random.PRNGKey(seed), arch)
        if pretrained_trunks:
            from multimodal_auv_tpu.interop.torch_import import (
                init_trunks_from_torchvision,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(pretrained_trunks)
            post, bs, st = init_trunks_from_torchvision(bundle, sd, spec=spec)
            bundle.post, bundle.batch_stats = post, bs
            logger.info("Pretrained trunk init from %s: %s",
                        pretrained_trunks, st)
        _train_multimodal_common(
            root_dir=root_dir, bundle=bundle, num_classes=num_classes,
            lr=lr_multimodal_model, weight_decay=weight_decay,
            num_epochs=num_epochs_multimodal, num_mc=num_mc,
            batch_size_multimodal=batch_size_multimodal,
            scheduler_step_size=scheduler_step_size,
            scheduler_gamma=scheduler_gamma,
            bathy_patch_base=bathy_patch_base_raw,
            sss_patch_base=sss_patch_base_raw,
            spec=spec, mc_chunk=mc_chunk, seed=seed,
            resume_checkpoint=resume_checkpoint,
            bf16_weights=bf16_weights,
            use_packed_loader=use_packed_loader,
            strict_errors=strict_errors,
            async_checkpoints=async_checkpoints,
            handle_preemption=handle_preemption,
            preemption_guard=preemption_guard,
            mesh_spec=mesh_spec,
            remat=remat,
            image_size=arch.image_size,
        )
        logger.info("Full training pipeline finished.")
        return True
    except Exception as e:
        logger.exception("An error occurred during AUV training from scratch: %s", e)
        return False


def run_auv_retraining(
    root_dir: str,
    devices: Optional[List] = None,
    const_bnn_prior_parameters: Optional[Dict[str, Any]] = None,
    num_classes: int = 7,
    lr_multimodal: float = 1e-5,
    multimodal_weight_decay: float = 1e-5,
    epochs_multimodal: int = 20,
    num_mc: int = 5,
    bathy_patch_base: int = 30,
    sss_patch_base: int = 30,
    batch_size_multimodal: int = 1,
    scheduler_multimodal_step_size: int = 7,
    scheduler_multimodal_gamma: float = 0.752,
    *,
    model_weights_path: Optional[str] = None,
    allow_random_init: bool = False,
    arch: Optional[ArchConfig] = None,
    mc_chunk: int = 1,
    seed: int = 0,
    resume_checkpoint: Optional[str] = None,
    freeze_backbone: bool = False,
    bf16_weights: bool = False,
    use_packed_loader: bool = False,
    strict_errors: bool = False,
    async_checkpoints: bool = False,
    handle_preemption: bool = True,
    preemption_guard=None,
    mesh_spec=None,
    dist_spec=None,
    remat: str = "on",
) -> bool:
    """Foundation-model retraining (functions.py:84-258): pretrained HF
    weights, fc2 head swapped when num_classes != 7, then multimodal
    fine-tuning. ``freeze_backbone=True`` trains only the fusion head
    (attention_*, fc/fc1/fc2) — BASELINE configs[3]'s frozen-backbone
    workload, which the reference gestures at but cannot express.
    ``dist_spec``: multi-host launch, see run_AUV_training_from_scratch."""
    try:
        from multimodal_auv_tpu.parallel.distributed import (
            maybe_initialize_distributed,
        )

        maybe_initialize_distributed(dist_spec)
        spec = (BNNPriorSpec.from_dict(const_bnn_prior_parameters)
                if isinstance(const_bnn_prior_parameters, dict)
                else (const_bnn_prior_parameters or BNNPriorSpec()))
        arch = arch or ArchConfig()
        bundle = make_multimodal_bundle(num_classes, spec,
                                        jax.random.PRNGKey(seed), arch)

        weights = hub.fetch_pretrained_weights(local_path=model_weights_path)
        if weights is not None:
            from multimodal_auv_tpu.interop.torch_import import (
                load_and_prepare_multimodal_model,
            )

            bundle, stats = load_and_prepare_multimodal_model(
                bundle, weights, num_classes=num_classes)
            logger.info("Pretrained weights loaded for retraining: %s", stats)
        elif not allow_random_init:
            raise RuntimeError(
                "No pretrained weights for retraining (offline and no "
                "model_weights_path); pass allow_random_init=True to train "
                "from random init instead.")

        _train_multimodal_common(
            root_dir=root_dir, bundle=bundle, num_classes=num_classes,
            lr=lr_multimodal, weight_decay=multimodal_weight_decay,
            num_epochs=epochs_multimodal, num_mc=num_mc,
            batch_size_multimodal=batch_size_multimodal,
            scheduler_step_size=scheduler_multimodal_step_size,
            scheduler_gamma=scheduler_multimodal_gamma,
            bathy_patch_base=bathy_patch_base,
            sss_patch_base=sss_patch_base,
            spec=spec, mc_chunk=mc_chunk, seed=seed,
            resume_checkpoint=resume_checkpoint,
            freeze_backbone=freeze_backbone,
            bf16_weights=bf16_weights,
            use_packed_loader=use_packed_loader,
            strict_errors=strict_errors,
            async_checkpoints=async_checkpoints,
            handle_preemption=handle_preemption,
            preemption_guard=preemption_guard,
            mesh_spec=mesh_spec,
            remat=remat,
            image_size=arch.image_size,
        )
        return True
    except Exception as e:
        logger.exception("An error occurred during retraining: %s", e)
        return False
