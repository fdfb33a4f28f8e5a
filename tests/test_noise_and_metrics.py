"""UIFM degradation, calibration metrics, and noise-study sweep tests."""
import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_auv_tpu.engine import metrics as MX
from multimodal_auv_tpu.engine.uifm import (
    B_INF_RGB,
    BETA_RGB,
    degrade_uniform,
    simulate_underwater_degradation,
)


def test_uifm_formula_golden():
    """I = J*exp(-beta*d) + B_inf*(1-exp(-beta*d)) elementwise."""
    img = jnp.full((1, 2, 2, 3), 0.6)
    d = jnp.ones((1, 2, 2, 1))
    turb, depth = 1.5, 1.0
    out = np.asarray(simulate_underwater_degradation(
        img, d, jnp.float32(turb), jnp.float32(depth)))
    for c in range(3):
        t = np.exp(-BETA_RGB[c] * turb)
        expected = 0.6 * t + B_INF_RGB[c] * (1 - t)
        np.testing.assert_allclose(out[0, :, :, c], expected, rtol=1e-5)


def test_uifm_limits():
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 4, 3))
    # zero turbidity -> identity
    np.testing.assert_allclose(np.asarray(degrade_uniform(img, 0.0)),
                               np.asarray(img), atol=1e-6)
    # extreme turbidity -> pure backscatter B_inf
    heavy = np.asarray(degrade_uniform(img, 1000.0))
    for c in range(3):
        np.testing.assert_allclose(heavy[..., c], B_INF_RGB[c], atol=1e-5)
    # output clamped to [0, 1]
    assert heavy.min() >= 0.0 and heavy.max() <= 1.0


def test_calibration_metrics_golden():
    # perfectly calibrated degenerate case: confidence 1.0, all correct
    probs = np.eye(3)[np.array([0, 1, 2, 0])]
    ece, emax = MX.calibration_metrics(probs, np.array([0, 1, 2, 0]))
    assert ece == pytest.approx(0.0)
    # all confident but wrong -> gap 1.0 in the top bin
    ece2, emax2 = MX.calibration_metrics(probs, np.array([1, 2, 0, 1]))
    assert ece2 == pytest.approx(1.0)
    assert emax2 == pytest.approx(1.0)


def test_auroc_and_f1():
    labels = [0, 0, 1, 1]
    pred = [0, 1, 1, 1]  # one error (idx 1)
    unc = [0.1, 0.9, 0.2, 0.3]  # highest uncertainty on the error
    assert MX.uncertainty_error_auroc(pred, labels, unc) == 1.0
    assert 0 < MX.macro_f1(pred, labels) <= 1.0


def test_append_fields_to_last_row(tmp_path):
    p = str(tmp_path / "m.csv")
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Epoch", "Acc"])
        w.writerow([1, 0.5])
        w.writerow([2, 0.6])
    assert MX.append_fields_to_last_row(p, {"F1_Score": "0.7", "ECE": "0.1"})
    rows = list(csv.DictReader(open(p)))
    assert rows[-1]["F1_Score"] == "0.7"
    assert rows[0]["F1_Score"] == ""  # earlier rows empty for new field


def test_confusion_matrix_with_unobserved_class(tmp_path):
    """A small epoch whose labels+predictions miss a class must still
    produce the PNG: with class_names the label set is pinned to
    range(n_classes) so the matrix is always full-size (previously the
    display_labels length mismatch crashed the plot into the non-fatal
    warning path and no artifact was written)."""
    import os

    from multimodal_auv_tpu.utils.plotting import save_confusion_matrix

    csv_path = str(tmp_path / "csvs" / "eval.csv")
    os.makedirs(os.path.dirname(csv_path), exist_ok=True)
    path = save_confusion_matrix([0, 1, 0], [1, 0, 0], csv_path,
                                 "multimodal", 3,
                                 class_names=["Sand", "Mud", "Rock"])
    assert path is not None and os.path.exists(path)


def test_confusion_matrix_with_out_of_range_prediction(tmp_path):
    """A head wider than the class list (e.g. num_classes=7 on a 3-class
    survey) can predict indices >= len(class_names); those samples must be
    COUNTED (label set extended with placeholder names), not silently
    dropped by pinning labels to range(len(class_names))."""
    import os

    import numpy as np
    from sklearn.metrics import confusion_matrix

    from multimodal_auv_tpu.utils.plotting import save_confusion_matrix

    csv_path = str(tmp_path / "csvs" / "eval.csv")
    os.makedirs(os.path.dirname(csv_path), exist_ok=True)
    from multimodal_auv_tpu.utils.plotting import _full_label_set

    labels, preds = [0, 1, 2, 0], [np.int64(5), 0, 2, 0]
    lab, names = _full_label_set(labels, preds, ["Sand", "Mud", "Rock"])
    assert lab == [0, 1, 2, 3, 4, 5]
    assert names == ["Sand", "Mud", "Rock", "class_3", "class_4", "class_5"]
    # the matrix built from that label set keeps every sample
    assert confusion_matrix(labels, preds, labels=lab).sum() == len(labels)
    path = save_confusion_matrix(labels, preds, csv_path, "multimodal", 1,
                                 class_names=["Sand", "Mud", "Rock"])
    assert path is not None and os.path.exists(path)


def test_noise_study_sweep_tiny(tmp_path):
    """Two turbidity steps, tiny arch, real fixture tree end-to-end."""
    from multimodal_auv_tpu.models.model_utils import ArchConfig
    from multimodal_auv_tpu.pipelines.noise_study import run_noise_study
    from tests.fixtures.make_tree import make_training_tree

    root = make_training_tree(str(tmp_path / "data"), n_samples=6)
    csv_dir = str(tmp_path / "noise")
    results = run_noise_study(
        root, csv_dir,
        turbidity_centers=[0.05, 2.05],
        depth_levels=[1.0],
        train_epochs_per_step=0,
        num_mc=2, batch_size=3,
        arch=ArchConfig.micro(image_size=64))
    assert len(results) == 2
    rows = list(csv.DictReader(open(os.path.join(csv_dir,
                                                 "noise_study_depth1.0.csv"))))
    assert len(rows) == 2
    assert "F1_Score" in rows[-1] and "Turbidity" in rows[-1]
    assert rows[-1]["Turbidity"] == "2.050"
    per_sample = os.listdir(os.path.join(csv_dir, "per_sample_metrics"))
    assert len(per_sample) == 2
    content = list(csv.DictReader(
        open(os.path.join(csv_dir, "per_sample_metrics", per_sample[0]))))
    assert set(content[0].keys()) == {
        "label", "prediction", "predictive_uncertainty",
        "epistemic_uncertainty", "aleatoric_uncertainty"}
