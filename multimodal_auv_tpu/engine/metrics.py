"""Extended evaluation metrics for the noise-study pipelines.

Reference: /root/reference/src/Multimodal_AUV/Examples/
"Example training with image noise.py":498-681 — macro-F1,
uncertainty-error AUROC, and 15-bin ECE/Emax calibration, appended to the
main metrics CSV via read-modify-write, plus per-sample CSVs.
"""
from __future__ import annotations

import csv
import logging
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def calibration_metrics(probabilities: np.ndarray, labels: np.ndarray,
                        n_bins: int = 15) -> Tuple[float, float]:
    """(ECE, Emax) with the reference's binning: confidences in
    (b_i, b_{i+1}] over n_bins equal-width bins."""
    confidences = np.max(probabilities, axis=1)
    predictions = np.argmax(probabilities, axis=1)
    accuracies = predictions == labels

    bounds = np.linspace(0, 1, n_bins + 1)
    ece = 0.0
    emax = 0.0
    for i in range(n_bins):
        in_bin = (confidences > bounds[i]) & (confidences <= bounds[i + 1])
        prop = np.mean(in_bin)
        if prop > 0:
            gap = abs(np.mean(accuracies[in_bin]) - np.mean(confidences[in_bin]))
            ece += gap * prop
            emax = max(emax, gap)
    return float(ece), float(emax)


def uncertainty_error_auroc(predicted: Sequence[int], labels: Sequence[int],
                            uncertainty: Sequence[float]) -> float:
    """AUROC of uncertainty as a predictor of misclassification."""
    from sklearn.metrics import roc_auc_score

    y_true_error = (np.asarray(predicted) != np.asarray(labels)).astype(int)
    return float(roc_auc_score(y_true_error, np.asarray(uncertainty)))


def macro_f1(predicted: Sequence[int], labels: Sequence[int]) -> float:
    from sklearn.metrics import f1_score

    return float(f1_score(labels, predicted, average="macro"))


def append_fields_to_last_row(csv_path: str, fields: Dict[str, str]) -> bool:
    """Read-modify-write: add columns to the last data row of a CSV
    (the reference's AUROC/F1/ECE append mechanism)."""
    try:
        with open(csv_path, newline="") as f:
            reader = csv.DictReader(f)
            rows = list(reader)
            fieldnames = list(reader.fieldnames or [])
        if not rows:
            return False
        for k, v in fields.items():
            if k not in fieldnames:
                fieldnames.append(k)
            rows[-1][k] = v
        # write-then-rename: an in-place open('w') truncates first, so a
        # crash mid-write (OOM/SIGKILL between epochs of a sweep) would
        # destroy every prior epoch's rows of the study ledger
        tmp = csv_path + ".tmp"
        with open(tmp, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fieldnames)
            w.writeheader()
            w.writerows(rows)
        os.replace(tmp, csv_path)
        return True
    except Exception as e:
        logger.warning("Could not append fields to %s: %s", csv_path, e)
        return False


def save_per_sample_metrics(csv_path: str, model_type: str, epoch: int,
                            bathy_patch_size: str, sss_patch_size: str,
                            data: Dict[str, List]) -> str:
    """Per-sample CSV under <csv_dir>/per_sample_metrics/ with the
    reference's filename scheme."""
    parent = os.path.dirname(os.path.abspath(csv_path))
    out_dir = os.path.join(parent, "per_sample_metrics")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(
        out_dir,
        f"per_sample_run_{model_type}_E{epoch + 1}"
        f"_B{bathy_patch_size}_S{sss_patch_size}.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(data.keys()))
        w.writeheader()
        w.writerows([dict(zip(data, t)) for t in zip(*data.values())])
    return path
