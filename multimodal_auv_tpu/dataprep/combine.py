"""Bathy channel combine — ``process_frame_channels_in_subfolders`` parity.

Reference: /root/reference/src/Multimodal_AUV/data_preparation/
image_processing.py:8-74. Per subfolder: delete stale ``demeaned``/
``average_subtracted`` files, then merge ``output_channel_1/2`` grayscale
PNGs into the R and G planes of a 3-channel image (B = 0) saved as
``combined_channels.png``.
"""
from __future__ import annotations

import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def process_frame_channels_in_subfolders(root_folder: str) -> int:
    import cv2

    if not os.path.exists(root_folder):
        logger.warning("Root folder not found: %s", root_folder)
        return 0

    combined = 0
    for name in os.listdir(root_folder):
        sub = os.path.join(root_folder, name)
        if not os.path.isdir(sub):
            continue

        for filename in os.listdir(sub):
            if "demeaned" in filename or "average_subtracted" in filename:
                try:
                    os.remove(os.path.join(sub, filename))
                except OSError as e:
                    logger.warning("Error deleting %s: %s", filename, e)

        ch1 = ch2 = None
        for filename in os.listdir(sub):
            p = os.path.join(sub, filename)
            if not os.path.isfile(p):
                continue
            if "output_channel_1" in filename:
                ch1 = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            elif "output_channel_2" in filename:
                ch2 = cv2.imread(p, cv2.IMREAD_GRAYSCALE)

        if ch1 is None or ch2 is None:
            logger.debug("Both channels not found in %s; skipping", sub)
            continue

        h, w = ch1.shape
        if ch2.shape != (h, w):
            ch2 = cv2.resize(ch2, (w, h))
        three = np.zeros((h, w, 3), np.uint8)
        three[:, :, 0] = ch1
        three[:, :, 1] = ch2
        cv2.imwrite(os.path.join(sub, "combined_channels.png"), three)
        combined += 1
    return combined
