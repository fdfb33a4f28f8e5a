"""run_auv_inference — the north-star pipeline (SURVEY.md §3.1).

Reference: /root/reference/src/Multimodal_AUV/functions/functions.py:26-82.
Same flow: resolve pretrained weights (HF Hub or local) -> inference loader
-> multimodal BNN -> MC predict -> CSV with the reference schema.

TPU deltas: the num_mc x triple-ResNet forward runs as one jitted XLA
program per batch (bf16 activations, fused Pallas weight sampling), instead
of num_mc sequential Python forwards.
"""
from __future__ import annotations

import logging
from typing import Optional

import jax

from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.engine.predict import multimodal_predict_and_save
from multimodal_auv_tpu.interop import hub
from multimodal_auv_tpu.models.model_utils import ArchConfig, make_multimodal_bundle


def run_auv_inference(
    data_directory,
    batch_size: int = 4,
    output_csv: str = "./inference_results.csv",
    num_mc_samples: int = 5,
    num_classes: int = 7,
    *,
    model_weights_path: Optional[str] = None,
    allow_random_init: bool = False,
    arch: Optional[ArchConfig] = None,
    mc_chunk: Optional[int] = None,
    seed: int = 0,
    use_packed_loader: bool = False,
    packed_cache_dir: Optional[str] = None,
    mesh_spec=None,
    use_dvp: bool = False,
    fast_sampling: Optional[bool] = None,
    bn_mode: str = "train",
):
    """Run multimodal BNN inference over one survey directory or a list of
    them (the reference's main.py:186-272 sweeps two sites via
    ConcatDataset — pass a list here for the same whole-survey run).

    Args mirror functions.py:26-31; extensions: ``model_weights_path`` (local
    torch checkpoint instead of the HF download), ``allow_random_init``
    (proceed without pretrained weights — for smoke tests/offline),
    ``arch``/``mc_chunk``/``seed``/``use_packed_loader`` (TPU knobs),
    ``use_dvp`` (single-pass moment-propagated serving, ~1.7x the exact-MC
    rate; guardrailed — auto-falls back to exact MC when the posterior
    spread leaves the validated regime, engine/moment.py);
    ``fast_sampling`` (None = auto: bf16-budget trimmed sampling noise
    exactly when sampling straight to bf16 — see engine/mc.py; False
    forces the ~1e-6 polynomials for debugging);
    ``bn_mode`` ("train" default = the reference's BN-in-train-mode
    inference quirk; "eval" = frozen running BN statistics — measured
    +12% serving throughput on v5e at b4x20MC with top-1 agreement 1.0
    but ~12% relative shift of predictive uncertainty: a documented
    divergence, engine/predict.py + BENCH_NOTES.md "Round 5").
    """
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s")
    logger = logging.getLogger(__name__)
    logger.info("Using devices: %s", jax.devices())

    arch = arch or ArchConfig()
    bundle = _pretrained_bundle(num_classes, arch, seed, model_weights_path,
                                allow_random_init, logger)

    dirs = ([data_directory] if isinstance(data_directory, (str, bytes))
            else list(data_directory))
    if use_packed_loader:
        # decode-once fast path: uint8 memmap batches, normalize on-chip
        import os

        from multimodal_auv_tpu.data.datasets import (
            ConcatDataset,
            InferenceFolderDataset,
        )
        from multimodal_auv_tpu.data.packing import pack_inference_dataset
        from multimodal_auv_tpu.engine.predict import (
            multimodal_predict_and_save_packed,
        )

        from multimodal_auv_tpu.data.packing import inference_fingerprint

        cache = packed_cache_dir or os.path.join(
            dirs[0], f".packed_cache_{arch.image_size}")
        # Staleness gate: the cache directory is keyed by dirs[0], so a
        # names.json existence check alone would silently reuse a cache
        # packed from a DIFFERENT directory list (or older on-disk state)
        # — emitting inference rows for the wrong survey. The folder scan
        # to fingerprint is cheap next to MC inference.
        datasets = [InferenceFolderDataset(d, image_size=arch.image_size)
                    for d in dirs]
        ds = datasets[0] if len(datasets) == 1 else ConcatDataset(datasets)
        meta_path = os.path.join(cache, "pack_meta.json")
        stale = True
        if os.path.exists(meta_path):
            import json

            meta = json.load(open(meta_path))
            stale = (meta.get("size") != arch.image_size
                     or meta.get("fingerprint") != inference_fingerprint(ds))
            if stale:
                logger.info("Packed cache %s is stale (different survey or "
                            "on-disk state) — repacking", cache)
        if stale:
            pack_inference_dataset(ds, cache, size=arch.image_size)
        mesh = None
        if mesh_spec is not None:
            from multimodal_auv_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(mesh_spec)
        step = None
        if use_dvp:
            from multimodal_auv_tpu.engine.moment import make_dvp_predict_step

            # mc_chunk must reach the builder: the step is prebuilt here, so
            # the mc_chunk forwarded to predict_and_save below is inert and
            # the guardrail's exact-MC fallback would otherwise silently
            # ignore the requested chunking.
            step = make_dvp_predict_step(bundle, num_mc_samples,
                                         on_excess="mc", packed_inputs=True,
                                         mc_chunk=mc_chunk)
        multimodal_predict_and_save_packed(
            bundle, cache, output_csv, num_mc_samples=num_mc_samples,
            batch_size=batch_size, key=jax.random.PRNGKey(seed + 1),
            mc_chunk=mc_chunk, fast_sampling=fast_sampling,
            bn_mode=bn_mode, mesh=mesh, step=step)
    else:
        from multimodal_auv_tpu.data.loaders import (
            prepare_inference_datasets_and_loaders,
        )

        dataloader = prepare_inference_datasets_and_loaders(
            dirs, batch_size, image_size=arch.image_size)
        mesh = None
        if mesh_spec is not None:
            from multimodal_auv_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(mesh_spec)
        step = None
        if use_dvp:
            from multimodal_auv_tpu.engine.moment import make_dvp_predict_step

            step = make_dvp_predict_step(bundle, num_mc_samples,
                                         on_excess="mc", mc_chunk=mc_chunk)
        multimodal_predict_and_save(
            bundle, dataloader, output_csv,
            num_mc_samples=num_mc_samples,
            key=jax.random.PRNGKey(seed + 1),
            mc_chunk=mc_chunk,
            fast_sampling=fast_sampling,
            bn_mode=bn_mode,
            model_type="multimodal",
            mesh=mesh, step=step)
    logger.info("Final inference process completed successfully.")
    return output_csv


def _pretrained_bundle(num_classes, arch, seed, model_weights_path,
                       allow_random_init, logger):
    """Build the multimodal bundle and load pretrained weights (HF download
    or local torch checkpoint) — shared by the serving entry points."""
    bundle = make_multimodal_bundle(num_classes, BNNPriorSpec(),
                                    jax.random.PRNGKey(seed), arch)
    weights = hub.fetch_pretrained_weights(local_path=model_weights_path)
    if weights is not None:
        from multimodal_auv_tpu.interop.torch_import import (
            load_and_prepare_multimodal_model,
        )

        bundle, stats = load_and_prepare_multimodal_model(
            bundle, weights, num_classes=num_classes)
        logger.info("Pretrained weights loaded: %s", stats)
    elif not allow_random_init:
        raise RuntimeError(
            "No pretrained weights available (offline and no "
            "model_weights_path). Pass allow_random_init=True to proceed "
            "with a randomly initialised model.")
    else:
        logger.warning("Proceeding with randomly initialised model.")
    return bundle


def export_auv_serving_artifact(
    output_dir: str,
    batch_size=4,  # int, or "poly" for a batch-polymorphic artifact
    num_mc_samples: int = 20,
    num_classes: int = 7,
    *,
    model_weights_path: Optional[str] = None,
    allow_random_init: bool = False,
    arch: Optional[ArchConfig] = None,
    mc_chunk: Optional[int] = None,
    seed: int = 0,
    platforms=None,
    use_dvp: bool = False,
    dvp_on_excess: str = "mc",
    data_shards: int = 1,
    mc_shards: int = 1,
    fast_sampling: Optional[bool] = None,
    bn_mode: str = "train",
):
    """Export an AOT serving artifact (serving.py): the compiled packed MC
    predict program + posterior state, loadable on a serving host with only
    jax + numpy (no model code, no HF access, no re-tracing).

    ``use_dvp`` exports the single-pass moment-propagation program instead
    (same ABI; guardrailed at export time — see serving.py).

    No reference analogue — functions.py:26-82 rebuilds its torch modules
    per process; this ships the compiled program itself."""
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s")
    logger = logging.getLogger(__name__)
    arch = arch or ArchConfig()
    bundle = _pretrained_bundle(num_classes, arch, seed, model_weights_path,
                                allow_random_init, logger)
    from multimodal_auv_tpu.serving import export_predict_artifact

    return export_predict_artifact(
        bundle, output_dir, batch_size=batch_size,
        num_mc_samples=num_mc_samples, image_size=arch.image_size,
        mc_chunk=mc_chunk, platforms=platforms, seed=seed,
        mode=("dvp" if use_dvp else "mc"), dvp_on_excess=dvp_on_excess,
        data_shards=data_shards, mc_shards=mc_shards,
        fast_sampling=fast_sampling, bn_mode=bn_mode)
