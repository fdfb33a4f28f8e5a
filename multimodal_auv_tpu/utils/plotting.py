"""Confusion-matrix PNG artifacts.

Path scheme and filename match the reference
(/root/reference/src/Multimodal_AUV/train/multimodal.py:322-347):
``{dirname(csv_path)}/confusion_matrices/conf_matrix_model_{type}_{epoch}.png``.
Plot failures are non-fatal (warning only), as in the reference.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

logger = logging.getLogger(__name__)


def _full_label_set(all_labels, all_predicted, class_names):
    """(labels, display_names) covering every class AND every observed
    index: a head wider than the class list (e.g. num_classes=7 on a
    3-class survey) can predict indices >= len(class_names), and pinning
    labels to range(len(class_names)) would make sklearn's
    confusion_matrix silently DROP those samples."""
    names = [str(c) for c in class_names]
    hi = max([int(v) for v in list(all_labels)]
             + [int(v) for v in list(all_predicted)]
             + [len(names) - 1])
    names += [f"class_{i}" for i in range(len(names), hi + 1)]
    return list(range(len(names))), names


def save_confusion_matrix(all_labels, all_predicted, csv_path: str,
                          model_type: str, epoch: int,
                          class_names: Optional[Sequence[str]] = None) -> Optional[str]:
    fig = None
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from sklearn.metrics import ConfusionMatrixDisplay, confusion_matrix

        # With class_names, pin the label set so the matrix is always
        # n_classes x n_classes: confusion_matrix defaults to the OBSERVED
        # classes only, and a small epoch missing a class made the
        # display_labels length mismatch crash the plot (the reference
        # passes no labels at all — its own comment says "Consider adding
        # labels=list(range(num_classes))", multimodal.py:324).
        display_labels = class_names
        labels = None
        if class_names is not None:
            labels, display_labels = _full_label_set(
                all_labels, all_predicted, class_names)
        cm = confusion_matrix(all_labels, all_predicted, labels=labels)
        disp = ConfusionMatrixDisplay(confusion_matrix=cm,
                                      display_labels=display_labels)
        fig, ax = plt.subplots(figsize=(8, 8))
        disp.plot(cmap="Blues", ax=ax)
        plt.title(f"Confusion Matrix for Epoch {epoch}")

        folder = os.path.join(os.path.dirname(csv_path), "confusion_matrices")
        os.makedirs(folder, exist_ok=True)
        path = os.path.join(folder, f"conf_matrix_model_{model_type}_{epoch}.png")
        plt.savefig(path)
        logger.info("Confusion matrix saved to: %s", path)
        return path
    except Exception as e:
        logger.warning("Confusion matrix not saved due to plotting error: %s", e)
        return None
    finally:
        if fig is not None:
            import matplotlib.pyplot as plt

            plt.close(fig)
