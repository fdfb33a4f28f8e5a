"""TensorBoard scalar logging with a CSV fallback.

The reference instantiates torch.utils.tensorboard.SummaryWriter in every
pipeline (/root/reference/src/Multimodal_AUV/functions/functions.py:128-130)
and logs per-batch/per-epoch scalars (SURVEY.md §5). Same schema here;
degrades to a plain scalars.csv when no TB backend is importable.
"""
from __future__ import annotations

import csv
import os
import time


class SummaryWriter:
    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter as TorchSW

            self._tb = TorchSW(log_dir=log_dir)
        except Exception:
            self._csv_path = os.path.join(log_dir, "scalars.csv")
            if not os.path.exists(self._csv_path):
                with open(self._csv_path, "w", newline="") as f:
                    csv.writer(f).writerow(["wall_time", "tag", "step", "value"])

    def add_scalar(self, tag: str, value, step: int):
        value = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        else:
            with open(self._csv_path, "a", newline="") as f:
                csv.writer(f).writerow([time.time(), tag, step, value])

    def flush(self):
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
