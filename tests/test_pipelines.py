"""End-to-end pipeline tests on fixture trees (tiny arch)."""
import csv
import os

import numpy as np
import pytest

from multimodal_auv_tpu.models.model_utils import ArchConfig
from tests.fixtures.make_tree import make_inference_tree, make_training_tree

TINY = ArchConfig.micro(image_size=64)  # pipeline semantics, not topology


def test_run_auv_inference_random_init(tmp_path):
    from multimodal_auv_tpu.pipelines.inference import run_auv_inference

    root = make_inference_tree(str(tmp_path / "dives"), n_samples=5)
    out_csv = str(tmp_path / "out.csv")
    run_auv_inference(root, batch_size=2, output_csv=out_csv,
                      num_mc_samples=3, num_classes=7,
                      allow_random_init=True, arch=TINY)
    rows = list(csv.reader(open(out_csv)))
    assert rows[0] == ["Image Name", "Predicted Class",
                       "Predictive Uncertainty", "Aleatoric Uncertainty"]
    assert len(rows) == 6  # 5 samples + header
    # aleatoric ~ ln(7) for a random 7-class model
    assert float(rows[1][3]) == pytest.approx(np.log(7), abs=0.2)


def test_run_training_from_scratch_tiny(tmp_path, monkeypatch):
    from multimodal_auv_tpu.config import BNNPriorSpec
    from multimodal_auv_tpu.pipelines.training import run_AUV_training_from_scratch

    monkeypatch.chdir(tmp_path)  # logs/ + tensorboard_logs/ land here
    root = make_training_tree(str(tmp_path / "data"), n_samples=6)
    ok = run_AUV_training_from_scratch(
        const_bnn_prior_parameters=BNNPriorSpec().to_dict(),
        lr_multimodal_model=1e-3,
        num_epochs_multimodal=1,
        num_mc=2,
        bathy_patch_base_raw=30,
        sss_patch_base_raw=30,
        batch_size_multimodal=3,
        root_dir=root,
        num_classes=0,  # derive from dataset
        arch=TINY,
    )
    assert ok is True
    csvs = os.path.join(root, "csvs")
    assert os.path.exists(os.path.join(csvs, "multimodal_train_results.csv"))
    assert os.path.exists(os.path.join(csvs, "multimodal_eval_results.csv"))
    # epoch 0 checkpoint on the reference path scheme
    assert os.path.isdir(os.path.join(root, "models"))


def test_run_retraining_random_init(tmp_path, monkeypatch):
    from multimodal_auv_tpu.pipelines.training import run_auv_retraining

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    root = make_training_tree(str(tmp_path / "data"), n_samples=6)
    ok = run_auv_retraining(
        root_dir=root, num_classes=3, epochs_multimodal=1, num_mc=2,
        batch_size_multimodal=3, allow_random_init=True, arch=TINY)
    assert ok is True


def test_unimodal_training_and_inference(tmp_path):
    from multimodal_auv_tpu.data.loaders import prepare_inference_dataloader
    from multimodal_auv_tpu.models.model_utils import make_unimodal_bundle
    from multimodal_auv_tpu.config import BNNPriorSpec
    from multimodal_auv_tpu.pipelines.unimodal import (
        run_unimodal_training,
        unimodal_predict_and_save,
    )
    import jax

    root = make_training_tree(str(tmp_path / "data"), n_samples=6)
    state = run_unimodal_training(root, model_type="sss", num_epochs=2,
                                  num_mc=2, batch_size=3,
                                  csv_dir=str(tmp_path / "csvs"), arch=TINY)
    assert os.path.exists(tmp_path / "csvs" / "unimodal_sss_train_results.csv")
    assert os.path.exists(tmp_path / "csvs" / "unimodal_sss_eval_results.csv")

    # unimodal optical inference (BASELINE configs[0])
    iroot = make_inference_tree(str(tmp_path / "dives"), n_samples=4)
    loader = prepare_inference_dataloader(iroot, batch_size=2)
    bundle = make_unimodal_bundle(3, 7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                  TINY)
    out = unimodal_predict_and_save(bundle, loader,
                                    str(tmp_path / "uni.csv"),
                                    num_mc_samples=3, model_type="image")
    rows = list(csv.reader(open(out)))
    assert len(rows) == 5


def test_patch_sweep_single_combo(tmp_path):
    from multimodal_auv_tpu.pipelines.sweep import run_patch_size_sweep

    root = make_training_tree(str(tmp_path / "data"), n_samples=6,
                              patch_sizes=("10m",))
    results = run_patch_size_sweep(
        root, str(tmp_path / "sweep"), bathy_sizes=[10], sss_sizes=[10],
        num_epochs=1, num_mc=2, batch_size=3, arch=TINY)
    assert len(results) == 1
    summary = list(csv.reader(open(tmp_path / "sweep" /
                                   "patch_sweep_summary.csv")))
    assert summary[0] == ["bathy_patch_m", "sss_patch_m",
                          "final_eval_accuracy"]
    assert summary[1][:2] == ["10", "10"]


def test_load_models_and_move_to_device(tmp_path):
    import jax

    from multimodal_auv_tpu.config import BNNPriorSpec
    from multimodal_auv_tpu.models.model_utils import (
        define_models,
        load_models,
        move_models_to_device,
    )

    # missing paths tolerated (reference model_utils.py:66-101)
    image, channels, sss = load_models({"image": str(tmp_path / "nope")},
                                       arch=TINY)
    assert "params" in image["variables"]
    models = define_models(3, BNNPriorSpec().to_dict(), jax.random.PRNGKey(0),
                           TINY)
    models = move_models_to_device(models)
    assert models["multimodal_model"].post.mu.devices()


def test_run_auv_inference_with_mesh(tmp_path):
    """Multi-chip serving path: batch sharded over the 'data' axis of a
    4-device mesh (virtual CPU devices)."""
    from multimodal_auv_tpu.config import MeshSpec
    from multimodal_auv_tpu.pipelines.inference import run_auv_inference

    root = make_inference_tree(str(tmp_path / "dives"), n_samples=5)
    out_csv = str(tmp_path / "mesh_out.csv")
    run_auv_inference(root, batch_size=4, output_csv=out_csv,
                      num_mc_samples=2, num_classes=7,
                      allow_random_init=True, arch=TINY,
                      mesh_spec=MeshSpec(data=4, mc=1))
    rows = list(csv.reader(open(out_csv)))
    assert len(rows) == 6


@pytest.mark.slow
def test_inference_pipeline_dvp_serving(tmp_path, monkeypatch):
    """run_auv_inference(use_dvp=True): guardrailed single-pass serving
    writes the reference-schema CSV on both the folder-loader and packed
    paths, and the guardrail's exact-MC fallback engages for a spread
    posterior without breaking the pipeline contract."""
    import numpy as np

    from multimodal_auv_tpu.models.model_utils import ArchConfig
    from multimodal_auv_tpu.pipelines.inference import run_auv_inference
    from tests.fixtures.make_tree import make_inference_tree

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    root = make_inference_tree(str(tmp_path / "dives"), n_samples=5)
    arch = ArchConfig.tiny(image_size=64)

    out1 = str(tmp_path / "dvp.csv")
    run_auv_inference(root, batch_size=2, output_csv=out1, num_mc_samples=4,
                      num_classes=7, allow_random_init=True, arch=arch,
                      use_dvp=True)
    rows = open(out1).read().strip().splitlines()
    assert rows[0] == ("Image Name,Predicted Class,Predictive Uncertainty,"
                       "Aleatoric Uncertainty")
    assert len(rows) == 1 + 5
    # uncertainties are finite and well-formed
    vals = np.asarray([r.split(",")[2:] for r in rows[1:]], np.float64)
    assert np.isfinite(vals).all()

    out2 = str(tmp_path / "dvp_packed.csv")
    run_auv_inference(root, batch_size=2, output_csv=out2, num_mc_samples=4,
                      num_classes=7, allow_random_init=True, arch=arch,
                      use_dvp=True, use_packed_loader=True)
    rows2 = open(out2).read().strip().splitlines()
    assert len(rows2) == 1 + 5


@pytest.mark.slow
def test_packed_inference_cache_staleness_gate(tmp_path, monkeypatch):
    """The packed cache dir is keyed by dirs[0], so a bare names.json
    existence check silently reused a cache packed from a DIFFERENT
    directory list — emitting rows for the wrong survey. The fingerprint
    gate (pack_meta.json) must force a repack when the survey changes."""
    from multimodal_auv_tpu.models.model_utils import ArchConfig
    from multimodal_auv_tpu.pipelines.inference import run_auv_inference
    from tests.fixtures.make_tree import make_inference_tree

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    rootA = make_inference_tree(str(tmp_path / "divesA"), n_samples=3)
    rootB = make_inference_tree(str(tmp_path / "divesB"), n_samples=2)
    arch = ArchConfig.tiny(image_size=64)

    outA = str(tmp_path / "a.csv")
    run_auv_inference(rootA, batch_size=2, output_csv=outA, num_mc_samples=2,
                      num_classes=7, allow_random_init=True, arch=arch,
                      use_packed_loader=True)
    assert len(open(outA).read().strip().splitlines()) == 1 + 3

    # same dirs[0] -> same cache dir; the old existence check would reuse
    # the 3-sample pack and silently drop rootB's samples
    outAB = str(tmp_path / "ab.csv")
    run_auv_inference([rootA, rootB], batch_size=2, output_csv=outAB,
                      num_mc_samples=2, num_classes=7,
                      allow_random_init=True, arch=arch,
                      use_packed_loader=True)
    assert len(open(outAB).read().strip().splitlines()) == 1 + 5


def test_run_manifest_written(tmp_path):
    """Every training pipeline drops run_manifest.json next to its CSVs:
    full config (JSON-safe), versions, devices — provenance the
    reference's timestamped log files don't give you."""
    import json

    from multimodal_auv_tpu.utils.manifest import write_run_manifest

    p = write_run_manifest(str(tmp_path), "unit", {
        "seed": 3, "arch": object(), "nested": {"lr": 1e-3, "t": (1, 2)}})
    m = json.load(open(p))
    assert m["kind"] == "unit" and m["config"]["seed"] == 3
    assert m["config"]["nested"]["t"] == [1, 2]
    assert isinstance(m["config"]["arch"], str)  # repr'd, not crashed
    assert m["versions"]["multimodal_auv_tpu"] == "0.1.0"
    assert m["devices"]["count"] >= 1 and m["devices"]["process_count"] >= 1

    # unwritable dir: logged, returns None, never raises
    assert write_run_manifest("/proc/definitely/not/writable", "x", {}) is None


@pytest.mark.parametrize("pipeline", ["scratch", "retrain", "unimodal"])
def test_quirk_switches_propagate_to_loops(tmp_path, monkeypatch, pipeline):
    """VERDICT r3 #7: every training pipeline must expose and PLUMB the
    quirk switches (strict_errors, async_checkpoints) into the epoch
    loops — a pipeline that accepts the kwarg but drops it would silently
    keep the reference's swallow-into-zeros behavior
    (train/multimodal.py:194-200) no matter what the caller asked for.
    The loop entry point is stubbed to capture its kwargs."""
    import multimodal_auv_tpu.pipelines.training as T
    import multimodal_auv_tpu.pipelines.unimodal as UP

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    root = make_training_tree(str(tmp_path / "data"), n_samples=6)
    captured = {}

    def stub(*args, **kwargs):
        captured.update(kwargs)
        return args[5]  # both loops take state as the 6th positional arg

    kw = dict(strict_errors=True, async_checkpoints=True,
              handle_preemption=False, arch=ArchConfig.tiny(image_size=32))
    if pipeline == "unimodal":
        monkeypatch.setattr(UP, "train_and_evaluate_unimodal_model", stub)
        UP.run_unimodal_training(root, model_type="sss", num_epochs=1,
                                 num_mc=1, batch_size=2, **kw)
    elif pipeline == "scratch":
        monkeypatch.setattr(T, "train_and_evaluate_multimodal_model", stub)
        assert T.run_AUV_training_from_scratch(
            const_bnn_prior_parameters={}, lr_multimodal_model=1e-3,
            num_epochs_multimodal=1, num_mc=1, bathy_patch_base_raw=30,
            sss_patch_base_raw=30, batch_size_multimodal=2, root_dir=root,
            num_classes=0, **kw)
    else:
        monkeypatch.setattr(T, "train_and_evaluate_multimodal_model", stub)
        assert T.run_auv_retraining(
            root_dir=root, num_classes=3, epochs_multimodal=1, num_mc=1,
            batch_size_multimodal=2, allow_random_init=True, **kw)
    assert captured.get("strict_errors") is True, captured.keys()
    assert captured.get("async_checkpoints") is True, captured.keys()


@pytest.mark.parametrize("pipeline", ["scratch", "retrain"])
def test_remat_propagates_to_train_step(tmp_path, monkeypatch, pipeline):
    """remat ("on"/"off"/"auto", VERDICT r3 #4) must reach make_train_step
    from both multimodal training entry points — the policy lives in the
    step builder, so a pipeline that dropped the kwarg would silently
    train with the default per-draw remat regardless of the flag."""
    import multimodal_auv_tpu.pipelines.training as T
    from multimodal_auv_tpu.engine.steps import (
        make_train_step as real_make_train_step,
    )

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    root = make_training_tree(str(tmp_path / "data"), n_samples=6)
    captured = {}

    def capture_step(*args, **kwargs):
        captured.update(kwargs)
        return real_make_train_step(*args, **kwargs)

    monkeypatch.setattr(T, "make_train_step", capture_step)
    monkeypatch.setattr(T, "train_and_evaluate_multimodal_model",
                        lambda *a, **k: a[5])
    kw = dict(handle_preemption=False, remat="off",
              arch=ArchConfig.tiny(image_size=32))
    if pipeline == "scratch":
        assert T.run_AUV_training_from_scratch(
            const_bnn_prior_parameters={}, lr_multimodal_model=1e-3,
            num_epochs_multimodal=1, num_mc=1, bathy_patch_base_raw=30,
            sss_patch_base_raw=30, batch_size_multimodal=2, root_dir=root,
            num_classes=0, **kw)
    else:
        assert T.run_auv_retraining(
            root_dir=root, num_classes=3, epochs_multimodal=1, num_mc=1,
            batch_size_multimodal=2, allow_random_init=True, **kw)
    assert captured.get("remat") == "off", captured.keys()


def test_fast_sampling_propagates_to_predict_step(tmp_path, monkeypatch):
    """fast_sampling must reach make_predict_step from run_auv_inference —
    the auto/on/off resolution lives in engine/mc.py, so a layer that
    dropped the kwarg would silently pin the default no matter what the
    CLI asked for (same failure mode as the quirk switches above)."""
    import multimodal_auv_tpu.engine.predict as EP
    from multimodal_auv_tpu.pipelines.inference import run_auv_inference

    root = make_inference_tree(str(tmp_path / "dives"), n_samples=3)
    captured = {}
    real = EP.make_predict_step

    def capture(*args, **kwargs):
        captured.update(kwargs)
        return real(*args, **kwargs)

    monkeypatch.setattr(EP, "make_predict_step", capture)
    run_auv_inference(root, batch_size=3,
                      output_csv=str(tmp_path / "out.csv"),
                      num_mc_samples=2, num_classes=7,
                      allow_random_init=True, arch=TINY,
                      fast_sampling=False)
    assert captured.get("fast_sampling") is False, captured.keys()


def test_fast_sampling_propagates_to_artifact_export(tmp_path, monkeypatch):
    """fast_sampling must reach make_packed_predict_step from the artifact
    export surface AND be recorded in meta.json: the flag is baked into the
    compiled program at export, so a layer that dropped it would make the
    production debug off-switch (docs/CLI.md) silently inert on the AOT
    serving path (round-4 verdict #7)."""
    import json as _json

    import multimodal_auv_tpu.engine.predict as EP
    from multimodal_auv_tpu.pipelines.inference import (
        export_auv_serving_artifact,
    )

    captured = {}
    real = EP.make_packed_predict_step

    def capture(*args, **kwargs):
        captured.update(kwargs)
        return real(*args, **kwargs)

    monkeypatch.setattr(EP, "make_packed_predict_step", capture)
    d = str(tmp_path / "artifact")
    export_auv_serving_artifact(
        output_dir=d, batch_size=2, num_mc_samples=2, num_classes=3,
        allow_random_init=True, arch=TINY, fast_sampling=False)
    assert captured.get("fast_sampling") is False, captured.keys()
    meta = _json.load(open(os.path.join(d, "meta.json")))
    assert meta["fast_sampling"] is False


def test_fast_sampling_propagates_to_unimodal_predict(tmp_path, monkeypatch):
    """Same propagation guarantee for the unimodal predict surface (its
    mc_logits call resolves fast_sampling in engine/mc.py)."""
    import jax

    import multimodal_auv_tpu.pipelines.unimodal as UP
    from multimodal_auv_tpu.config import BNNPriorSpec
    from multimodal_auv_tpu.data.loaders import prepare_inference_dataloader
    from multimodal_auv_tpu.models.model_utils import make_unimodal_bundle

    iroot = make_inference_tree(str(tmp_path / "dives"), n_samples=2)
    loader = prepare_inference_dataloader(iroot, batch_size=2)
    bundle = make_unimodal_bundle(3, 7, BNNPriorSpec(),
                                  jax.random.PRNGKey(0), TINY)
    captured = {}
    real = UP.mc_logits

    def capture(*args, **kwargs):
        captured.update(kwargs)
        return real(*args, **kwargs)

    monkeypatch.setattr(UP, "mc_logits", capture)
    UP.unimodal_predict_and_save(bundle, loader,
                                 str(tmp_path / "uni.csv"),
                                 num_mc_samples=2, model_type="image",
                                 fast_sampling=False)
    assert captured.get("fast_sampling") is False, captured.keys()


def test_noise_study_strict_errors_reraises(tmp_path, monkeypatch):
    """run_noise_study(strict_errors=True) re-raises extended-metric
    failures instead of the reference's warn-and-continue (the AUROC /
    F1 / ECE try-excepts in "Example training with image noise.py")."""
    import multimodal_auv_tpu.engine.metrics as MX
    from multimodal_auv_tpu.pipelines.noise_study import run_noise_study

    root = make_training_tree(str(tmp_path / "data"), n_samples=6)

    def boom(*a, **k):
        raise RuntimeError("degenerate error set")

    monkeypatch.setattr(MX, "uncertainty_error_auroc", boom)
    with pytest.raises(RuntimeError, match="degenerate"):
        run_noise_study(root, str(tmp_path / "csvs"),
                        turbidity_centers=[0.5], num_mc=1, batch_size=2,
                        arch=ArchConfig.tiny(image_size=32),
                        strict_errors=True)
    # default keeps reference behavior: warn and continue
    res = run_noise_study(root, str(tmp_path / "csvs2"),
                          turbidity_centers=[0.5], num_mc=1, batch_size=2,
                          arch=ArchConfig.tiny(image_size=32))
    assert len(res) == 1 and "accuracy" in res[0]


def test_bn_mode_propagates_to_predict_step_and_export(tmp_path, monkeypatch):
    """bn_mode must reach the step builders from run_auv_inference AND the
    artifact export surface, and be recorded in meta.json (it is baked
    into the AOT program, like fast_sampling) — a dropped kwarg would
    silently pin the reference-faithful default no matter what the CLI
    asked for."""
    import json as _json

    import multimodal_auv_tpu.engine.predict as EP
    from multimodal_auv_tpu.pipelines.inference import (
        export_auv_serving_artifact,
        run_auv_inference,
    )

    root = make_inference_tree(str(tmp_path / "dives"), n_samples=3)
    captured = {}
    real = EP.make_predict_step

    def capture(*args, **kwargs):
        captured.update(kwargs)
        return real(*args, **kwargs)

    monkeypatch.setattr(EP, "make_predict_step", capture)
    run_auv_inference(root, batch_size=3,
                      output_csv=str(tmp_path / "out.csv"),
                      num_mc_samples=2, num_classes=7,
                      allow_random_init=True, arch=TINY, bn_mode="eval")
    assert captured.get("bn_mode") == "eval", captured.keys()

    captured.clear()
    real_packed = EP.make_packed_predict_step

    def capture_packed(*args, **kwargs):
        captured.update(kwargs)
        return real_packed(*args, **kwargs)

    monkeypatch.setattr(EP, "make_packed_predict_step", capture_packed)
    d = str(tmp_path / "artifact")
    export_auv_serving_artifact(
        output_dir=d, batch_size=2, num_mc_samples=2, num_classes=3,
        allow_random_init=True, arch=TINY, bn_mode="eval")
    assert captured.get("bn_mode") == "eval", captured.keys()
    meta = _json.load(open(os.path.join(d, "meta.json")))
    assert meta["bn_mode"] == "eval"
