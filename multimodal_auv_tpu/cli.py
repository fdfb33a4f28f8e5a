"""Console entry points — flag-for-flag parity with the reference CLIs
(/root/reference/src/Multimodal_AUV/cli.py:24,70,101,207; console scripts in
pyproject.toml:83-87), minus its known defects: the reference imports a
non-existent ``run_auv_training`` (crashing retrain/scratch CLIs at import)
and passes dicts where scalars are expected (SURVEY.md §2.7) — both fixed.

TPU deltas: ``--devices`` is accepted but informational (placement is mesh
driven); new optional flags ``--model_weights``, ``--allow_random_init``,
``--mc_chunk``, ``--tiny`` (test arch).
"""
from __future__ import annotations

import argparse
import logging
import sys


def _arch(args):
    from multimodal_auv_tpu.models.model_utils import ArchConfig

    return ArchConfig.tiny(image_size=64) if getattr(args, "tiny", False) else ArchConfig()


def _add_mesh_flags(parser):
    parser.add_argument("--mesh_data", type=int, default=0,
                        help="Train data-parallel over an N-device ('data',) "
                             "mesh axis (batch must be divisible by N). "
                             "0 = single device.")
    parser.add_argument("--mesh_mc", type=int, default=1,
                        help="Shard the MC ensemble over an M-device ('mc',) "
                             "mesh axis (num_mc divisible by M). Needs "
                             "mesh_data*mesh_mc devices.")
    parser.add_argument("--fsdp", action="store_true",
                        help="Shard the packed posterior + Adam moments over "
                             "the whole mesh (FSDP); otherwise parameters "
                             "are replicated.")


def _mesh_spec(args):
    if args.mesh_data <= 0 and args.mesh_mc <= 1 and not args.fsdp:
        return None
    from multimodal_auv_tpu.config import MeshSpec

    # data=0 means AUTO in make_mesh (n_devices // mc): forcing it to 1
    # here made a bare --fsdp (or --mesh_mc alone) silently build a 1x1
    # mesh, turning the flag into a no-op (round-3 advisor finding)
    return MeshSpec(data=max(args.mesh_data, 0), mc=max(args.mesh_mc, 1),
                    fsdp=args.fsdp)


def _add_dist_flags(parser):
    parser.add_argument("--coordinator", type=str, default=None,
                        help="Multi-host training: coordinator address "
                             "'host:port' (jax.distributed). Every host "
                             "runs this same command with its own "
                             "--process_id; env fallback AUV_COORDINATOR/"
                             "AUV_NUM_PROCESSES/AUV_PROCESS_ID.")
    parser.add_argument("--num_processes", type=int, default=0,
                        help="Multi-host: total number of host processes.")
    parser.add_argument("--process_id", type=int, default=None,
                        help="Multi-host: this host's process index (0 is "
                             "the coordinator and owns the CSV/TB ledgers).")
    parser.add_argument("--dist_timeout", type=int, default=300,
                        help="Multi-host: coordinator rendezvous timeout "
                             "(seconds).")


def _dist_spec(args):
    if args.num_processes and args.num_processes > 1:
        from multimodal_auv_tpu.config import DistSpec

        return DistSpec(coordinator=args.coordinator,
                        num_processes=args.num_processes,
                        process_id=args.process_id,
                        initialization_timeout=args.dist_timeout)
    return None  # pipelines still consult the AUV_* env (DistSpec.from_env)


def data_preparation_cli(argv=None):
    parser = argparse.ArgumentParser(
        description="Prepare AUV survey data: optical preprocessing, "
                    "GeoTIFF patch extraction, bathy channel combine.")
    parser.add_argument("--raw_optical_images_folder", type=str, required=True,
                        help="Folder of raw optical JPEGs (scanned recursively).")
    parser.add_argument("--geotiff_folder", type=str, required=True,
                        help="Folder containing bathymetry/SSS GeoTIFFs.")
    parser.add_argument("--output_folder", type=str, required=True,
                        help="Destination folder for per-sample directories.")
    parser.add_argument("--exiftool_path", type=str, default="exiftool",
                        help="Path to the exiftool binary (optional here; a "
                             "built-in EXIF reader is the fallback).")
    parser.add_argument("--window_size_meters", type=float, default=20.0,
                        help="Patch window size in meters.")
    parser.add_argument("--image_enhancement_method", type=str,
                        default="AverageSubtraction",
                        choices=["AverageSubtraction", "CLAHE"],
                        help="Optical enhancement method.")
    parser.add_argument("--skip_bathy_combine", action="store_true",
                        help="Skip the bathy channel-combine step.")
    args = parser.parse_args(argv)

    from multimodal_auv_tpu.pipelines import run_auv_preprocessing

    run_auv_preprocessing(
        raw_optical_images_folder=args.raw_optical_images_folder,
        geotiff_folder=args.geotiff_folder,
        output_folder=args.output_folder,
        exiftool_path=args.exiftool_path,
        window_size_meters=args.window_size_meters,
        image_enhancement_method=args.image_enhancement_method,
        skip_bathy_combine=args.skip_bathy_combine,
    )
    return 0


def inference_cli(argv=None):
    parser = argparse.ArgumentParser(
        description="Multimodal AUV BNN inference with MC uncertainty.")
    parser.add_argument("--data_dir", type=str, required=True,
                        help="Path to the input data directory for inference.")
    parser.add_argument("--output_csv", type=str, required=True,
                        help="Path to save the inference results CSV.")
    parser.add_argument("--batch_size", type=int, default=4,
                        help="Batch size for inference (default: 4).")
    parser.add_argument("--num_mc_samples", type=int, default=20,
                        help="Number of Monte Carlo samples (default: 20).")
    parser.add_argument("--num_classes", type=int, default=7)
    parser.add_argument("--model_weights", type=str, default=None,
                        help="Local torch checkpoint (skips the HF download).")
    parser.add_argument("--allow_random_init", action="store_true")
    parser.add_argument("--mc_chunk", type=int, default=1)
    parser.add_argument("--packed_loader", action="store_true",
                        help="decode-once serving: pack the survey into "
                             "uint8 memmaps, normalize on-chip")
    parser.add_argument("--dvp", action="store_true",
                        help="single-pass moment-propagated serving "
                             "(approximate; auto-falls back to exact MC "
                             "outside the validated posterior-spread "
                             "regime)")
    parser.add_argument("--fast_sampling", choices=("auto", "on", "off"),
                        default="auto",
                        help="bf16-budget fast-math sampling noise (auto = "
                             "on exactly when sampling straight to bf16; "
                             "'off' forces the ~1e-6 polynomials)")
    parser.add_argument("--bn_mode", choices=("train", "eval"),
                        default="train",
                        help="BatchNorm statistics at inference: 'train' "
                             "(reference-faithful current-batch stats) or "
                             "'eval' (frozen running stats; measured +12%% "
                             "serving throughput, predictive uncertainty "
                             "shifts ~12%% relative — documented "
                             "divergence, BENCH_NOTES.md)")
    parser.add_argument("--tiny", action="store_true", help=argparse.SUPPRESS)
    args = parser.parse_args(argv)

    from multimodal_auv_tpu.utils.devices import enable_compilation_cache

    enable_compilation_cache()  # cold-start amortization (utils/devices.py)
    from multimodal_auv_tpu.pipelines import run_auv_inference

    run_auv_inference(
        data_directory=args.data_dir,
        batch_size=args.batch_size,
        output_csv=args.output_csv,
        num_mc_samples=args.num_mc_samples,
        num_classes=args.num_classes,
        model_weights_path=args.model_weights,
        allow_random_init=args.allow_random_init,
        arch=_arch(args),
        mc_chunk=args.mc_chunk,
        use_packed_loader=args.packed_loader,
        use_dvp=args.dvp,
        fast_sampling={"auto": None, "on": True, "off": False}[
            args.fast_sampling],
        bn_mode=args.bn_mode,
    )
    return 0


def retraining_cli(argv=None):
    parser = argparse.ArgumentParser(
        description="Retrain the pretrained multimodal AUV BNN on new data.")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--batch_size_multimodal", type=int, default=20)
    parser.add_argument("--num_epochs_multimodal", type=int, default=20)
    parser.add_argument("--num_mc_samples", type=int, default=20)
    parser.add_argument("--learning_rate_multimodal", type=float, default=0.001)
    parser.add_argument("--weight_decay_multimodal", type=float, default=1e-5)
    parser.add_argument("--bathy_patch_base", type=int, default=30)
    parser.add_argument("--sss_patch_base", type=int, default=30)
    parser.add_argument("--num_classes", type=int, default=10)
    parser.add_argument("--devices", type=str, default="tpu",
                        help="Informational on TPU; placement is mesh-driven.")
    parser.add_argument("--model_weights", type=str, default=None)
    parser.add_argument("--allow_random_init", action="store_true")
    parser.add_argument("--bf16_weights", action="store_true",
                        help="mixed-precision training: bf16 sampled "
                             "weights, f32 master posterior")
    parser.add_argument("--strict_errors", action="store_true",
                        help="re-raise mid-epoch exceptions instead of the reference's swallow-into-zero-metrics (crash-save still happens)")
    parser.add_argument("--async_checkpoints", action="store_true",
                        help="commit epoch-cadence checkpoints in a "
                             "background thread (orbax async)")
    parser.add_argument("--resume_checkpoint", type=str, default=None,
                        help="path for true resume: posterior + optimizer "
                             "+ epoch + scheduler state saved every epoch; "
                             "a restarted run with the same arguments "
                             "resumes bit-reproducibly (docs/TRAINING.md)")
    parser.add_argument("--packed_loader", action="store_true",
                        help="decode-once training: uint8 memmap batches, "
                             "normalize on-chip")
    parser.add_argument("--freeze_backbone", action="store_true",
                        help="Train only the fusion head (foundation-model "
                             "fine-tuning with frozen ResNet trunks).")
    parser.add_argument("--mc_chunk", type=int, default=1)
    parser.add_argument("--remat", choices=("on", "off", "auto"),
                        default="on",
                        help="MC-draw rematerialisation: on (memory flat in "
                             "num_mc), off (store residuals; faster when "
                             "they fit HBM), auto (resolve from the "
                             "compiled program's memory analysis, OOM-safe "
                             "fallback — BENCH_NOTES round 4)")
    _add_mesh_flags(parser)
    _add_dist_flags(parser)
    parser.add_argument("--tiny", action="store_true", help=argparse.SUPPRESS)
    args = parser.parse_args(argv)

    from multimodal_auv_tpu.utils.devices import enable_compilation_cache

    enable_compilation_cache()  # cold-start amortization (utils/devices.py)
    from multimodal_auv_tpu.engine.preemption import (PREEMPTED_EXIT_CODE,
                                                      PreemptionGuard)
    from multimodal_auv_tpu.pipelines import run_auv_retraining

    guard = PreemptionGuard()
    with guard:
        ok = run_auv_retraining(
        root_dir=args.data_dir,
        num_classes=args.num_classes,
        lr_multimodal=args.learning_rate_multimodal,
        multimodal_weight_decay=args.weight_decay_multimodal,
        epochs_multimodal=args.num_epochs_multimodal,
        num_mc=args.num_mc_samples,
        bathy_patch_base=args.bathy_patch_base,
        sss_patch_base=args.sss_patch_base,
        batch_size_multimodal=args.batch_size_multimodal,
        model_weights_path=args.model_weights,
        allow_random_init=args.allow_random_init,
        freeze_backbone=args.freeze_backbone,
        bf16_weights=args.bf16_weights,
        use_packed_loader=args.packed_loader,
        strict_errors=args.strict_errors,
        async_checkpoints=args.async_checkpoints,
            resume_checkpoint=args.resume_checkpoint,
            arch=_arch(args),
            mc_chunk=args.mc_chunk,
            remat=args.remat,
            mesh_spec=_mesh_spec(args),
            dist_spec=_dist_spec(args),
            preemption_guard=guard,
        )
    if guard.triggered:
        # EX_TEMPFAIL: schedulers re-run the job; resume picks up the
        # checkpoint (docs/TRAINING.md)
        return PREEMPTED_EXIT_CODE
    return 0 if ok else 1


def training_from_scratch_cli(argv=None):
    parser = argparse.ArgumentParser(
        description="Train the multimodal AUV BNN from scratch.")
    parser.add_argument("--root_dir", type=str, required=True)
    parser.add_argument("--epochs_multimodal", type=int, default=20)
    parser.add_argument("--num_mc", type=int, default=20)
    parser.add_argument("--batch_size_multimodal", type=int, default=20)
    parser.add_argument("--lr_multimodal", type=float, default=0.001)
    parser.add_argument("--num_classes", type=int, default=10)
    parser.add_argument("--devices", type=str, default="tpu")
    parser.add_argument("--batch_size_unimodal", type=int, default=8)
    parser.add_argument("--bathy_patch_base", type=int, default=30)
    parser.add_argument("--sss_patch_base", type=int, default=30)
    parser.add_argument("--mc_chunk", type=int, default=1)
    parser.add_argument("--bf16_weights", action="store_true",
                        help="mixed-precision training: bf16 sampled "
                             "weights, f32 master posterior")
    parser.add_argument("--strict_errors", action="store_true",
                        help="re-raise mid-epoch exceptions instead of the reference's swallow-into-zero-metrics (crash-save still happens)")
    parser.add_argument("--async_checkpoints", action="store_true",
                        help="commit epoch-cadence checkpoints in a "
                             "background thread (orbax async)")
    parser.add_argument("--resume_checkpoint", type=str, default=None,
                        help="path for true resume: posterior + optimizer "
                             "+ epoch + scheduler state saved every epoch; "
                             "a restarted run with the same arguments "
                             "resumes bit-reproducibly (docs/TRAINING.md)")
    parser.add_argument("--packed_loader", action="store_true",
                        help="decode-once training: uint8 memmap batches, "
                             "normalize on-chip")
    parser.add_argument("--pretrained_trunks", type=str, default=None,
                        help="torchvision-named ResNet-50 state dict (.pth): "
                             "MOPED-initialise all three feature trunks "
                             "(offline stand-in for IMAGENET1K_V1)")
    parser.add_argument("--remat", choices=("on", "off", "auto"),
                        default="on",
                        help="MC-draw rematerialisation: on (memory flat in "
                             "num_mc), off (store residuals; faster when "
                             "they fit HBM), auto (resolve from the "
                             "compiled program's memory analysis, OOM-safe "
                             "fallback — BENCH_NOTES round 4)")
    _add_mesh_flags(parser)
    _add_dist_flags(parser)
    parser.add_argument("--tiny", action="store_true", help=argparse.SUPPRESS)
    args = parser.parse_args(argv)

    from multimodal_auv_tpu.utils.devices import enable_compilation_cache

    enable_compilation_cache()  # cold-start amortization (utils/devices.py)
    from multimodal_auv_tpu.config import BNNPriorSpec
    from multimodal_auv_tpu.engine.preemption import (PREEMPTED_EXIT_CODE,
                                                      PreemptionGuard)
    from multimodal_auv_tpu.pipelines import run_AUV_training_from_scratch

    guard = PreemptionGuard()
    with guard:
        ok = run_AUV_training_from_scratch(
        const_bnn_prior_parameters=BNNPriorSpec().to_dict(),
        lr_multimodal_model=args.lr_multimodal,
        num_epochs_multimodal=args.epochs_multimodal,
        num_mc=args.num_mc,
        bathy_patch_base_raw=args.bathy_patch_base,
        sss_patch_base_raw=args.sss_patch_base,
        batch_size_multimodal=args.batch_size_multimodal,
        root_dir=args.root_dir,
        num_classes=args.num_classes,
        arch=_arch(args),
        mc_chunk=args.mc_chunk,
        pretrained_trunks=args.pretrained_trunks,
        bf16_weights=args.bf16_weights,
        use_packed_loader=args.packed_loader,
            strict_errors=args.strict_errors,
            async_checkpoints=args.async_checkpoints,
            resume_checkpoint=args.resume_checkpoint,
            remat=args.remat,
            mesh_spec=_mesh_spec(args),
            dist_spec=_dist_spec(args),
            preemption_guard=guard,
        )
    if guard.triggered:
        return PREEMPTED_EXIT_CODE
    return 0 if ok else 1


def export_serving_cli(argv=None):
    """Export an AOT serving artifact: compiled MC-predict program + state
    (serving.py) — a TPU-native extra with no reference analogue."""
    parser = argparse.ArgumentParser(
        description="Export an AOT serving artifact (compiled StableHLO "
                    "predict program + posterior state). A serving host "
                    "loads it with only jax + numpy.")
    parser.add_argument("--output_dir", type=str, required=True,
                        help="Artifact directory to write.")
    parser.add_argument("--batch_size", default="4",
                        help="Static serving batch size (pad + mask ragged "
                             "tails), or 'poly' for a batch-polymorphic "
                             "artifact (any size, one XLA specialization "
                             "per distinct size).")
    parser.add_argument("--num_mc_samples", type=int, default=20)
    parser.add_argument("--num_classes", type=int, default=7)
    parser.add_argument("--model_weights", type=str, default=None,
                        help="Local torch checkpoint (skips the HF download).")
    parser.add_argument("--allow_random_init", action="store_true")
    parser.add_argument("--mc_chunk", type=int, default=None)
    parser.add_argument("--dvp", action="store_true",
                        help="Export the single-pass moment-propagation "
                             "program (~1.7x serving rate; guardrailed at "
                             "export time, see docs).")
    parser.add_argument("--mc_shards", type=int, default=1,
                        help="Spread the MC ensemble over an M-device "
                             "('mc',) mesh axis (BNN ensemble parallelism "
                             "— low-latency multi-chip serving for small "
                             "batches). Composes with --data_shards; "
                             "exact-MC mode only.")
    parser.add_argument("--data_shards", type=int, default=1,
                        help="Export a multi-device program: batch sharded "
                             "over an N-device ('data',) mesh, state "
                             "replicated. Serving host needs >= N devices; "
                             "batch_size must be static and divisible by N.")
    parser.add_argument("--dvp_on_excess", choices=("warn", "mc"),
                        default="mc",
                        help="Guardrail action if the posterior spread "
                             "exceeds the DVP-validated regime: 'mc' "
                             "exports the exact MC program instead "
                             "(recorded in meta.json), 'warn' exports DVP "
                             "anyway.")
    parser.add_argument("--platforms", type=str, default=None,
                        help="Comma-separated lowering targets, e.g. 'tpu' "
                             "or 'tpu,cpu' (default: current backend).")
    parser.add_argument("--fast_sampling", choices=("auto", "on", "off"),
                        default="auto",
                        help="bf16-budget fast-math sampling noise, baked "
                             "into the exported program (auto = on exactly "
                             "when sampling to bf16 on a split path; "
                             "recorded in meta.json).")
    parser.add_argument("--bn_mode", choices=("train", "eval"),
                        default="train",
                        help="BatchNorm statistics baked into the exported "
                             "program: 'train' (reference-faithful) or "
                             "'eval' (frozen running stats, +12%% measured; "
                             "recorded in meta.json).")
    parser.add_argument("--tiny", action="store_true", help=argparse.SUPPRESS)
    args = parser.parse_args(argv)

    from multimodal_auv_tpu.pipelines import export_auv_serving_artifact
    from multimodal_auv_tpu.utils.devices import enable_compilation_cache

    enable_compilation_cache()  # cold-start amortization (utils/devices.py)
    export_auv_serving_artifact(
        output_dir=args.output_dir,
        batch_size=("poly" if args.batch_size == "poly"
                    else int(args.batch_size)),
        num_mc_samples=args.num_mc_samples,
        num_classes=args.num_classes,
        model_weights_path=args.model_weights,
        allow_random_init=args.allow_random_init,
        arch=_arch(args),
        mc_chunk=args.mc_chunk,
        platforms=(args.platforms.split(",") if args.platforms else None),
        use_dvp=args.dvp,
        dvp_on_excess=args.dvp_on_excess,
        data_shards=args.data_shards,
        mc_shards=args.mc_shards,
        fast_sampling={"auto": None, "on": True, "off": False}[
            args.fast_sampling],
        bn_mode=args.bn_mode,
    )
    return 0


def selfcheck_cli(argv=None):
    """Installed-package self-check on synthetic data (selfcheck.py) — the
    working equivalent of the reference's run_installed_package_tests.py
    (which needs hand-edited absolute paths and crashes at import)."""
    from multimodal_auv_tpu.selfcheck import main as selfcheck_main

    return selfcheck_main(argv)


_COMMANDS = {
    "data-prep": data_preparation_cli,
    "inference": inference_cli,
    "retrain": retraining_cli,
    "train-scratch": training_from_scratch_cli,
    "export-serving": export_serving_cli,
    "selfcheck": selfcheck_cli,
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in _COMMANDS:
        print("usage: python -m multimodal_auv_tpu.cli "
              f"{{{','.join(_COMMANDS)}}} [args...]", file=sys.stderr)
        return 2
    return _COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    sys.exit(main())
