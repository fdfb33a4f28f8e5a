"""Synthetic on-disk fixture trees for dataset tests.

The reference never tests its dataset classes against real folders
(SURVEY.md §4); here we generate miniature survey trees that follow the
exact file-naming contract."""
import os

import numpy as np
from PIL import Image


def _save(path, arr):
    Image.fromarray(arr).save(path)


def rgb(h=32, w=32, value=128):
    a = np.full((h, w, 3), value, np.uint8)
    a[0, 0] = 255  # ensure nonzero
    return a


def gray(h=32, w=32, value=100):
    a = np.full((h, w), value, np.uint8)
    a[0, 0] = 255
    return a


def make_training_tree(root, n_samples=6, labels=("Sand", "Mud", "Rock"),
                       patch_sizes=("10m", "30m")):
    """Folders satisfying MultimodalFolderDataset's scan rules."""
    os.makedirs(root, exist_ok=True)
    for i in range(n_samples):
        d = os.path.join(root, f"sample_{i:03d}")
        os.makedirs(d, exist_ok=True)
        _save(os.path.join(d, f"frame_{i:04d}.jpg"), rgb(value=60 + i))
        _save(os.path.join(d, f"survey_SSS_{i}.png"), gray(value=90 + i))
        _save(os.path.join(d, "combined_rgb_bathymetry.jpg"), rgb(value=80))
        for ps in patch_sizes:
            _save(os.path.join(d, f"patch_{ps}_combined_bathy.png"), rgb(value=70))
            _save(os.path.join(d, f"patch_{ps}_survey_SSS.png"), gray(value=50))
        label = labels[i % len(labels)]
        with open(os.path.join(d, f"{label}.txt"), "w") as f:
            f.write(label)
        with open(os.path.join(d, "normalised_meta.csv"), "w") as f:
            f.write("easting,northing\n1,2\n")
    return root


def make_inference_tree(root, n_samples=5):
    """Folders satisfying InferenceFolderDataset's scan rules."""
    os.makedirs(root, exist_ok=True)
    for i in range(n_samples):
        d = os.path.join(root, f"dive_{i:03d}")
        os.makedirs(d, exist_ok=True)
        _save(os.path.join(d, f"Frame_{i:04d}.jpg"), rgb(value=55 + i))
        _save(os.path.join(d, f"line_SSS_{i}.png"), gray(value=77))
        _save(os.path.join(d, "patch_30m_combined_bathy.png"), rgb(value=66))
    return root
