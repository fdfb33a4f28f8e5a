"""Folder-scanning datasets with the reference's exact discovery rules.

* ``MultimodalFolderDataset`` == ``CustomImageDataset`` (labeled training
  dataset, /root/reference/src/Multimodal_AUV/data/datasets.py:202-398):
  per sample folder it requires a ``*frame*.jpg`` main image, the
  max-nonzero ``*SSS*`` image (excluding ``patch_`` files),
  ``combined_rgb_bathymetry.jpg``, at least one
  ``patch_<N>m_combined_bathy.png`` / ``patch_<N>m_*_SSS.(png|jpg)`` patch,
  a ``normalised_meta.csv``, and a label from the newest non-underscore
  ``.txt`` basename. Labels are encoded with sklearn's LabelEncoder
  (alphabetical). Missing patch sizes yield zero dummies so every sample
  carries the full discovered patch-size set.

* ``InferenceFolderDataset`` == ``CustomImageDataset_1`` (unlabeled,
  datasets.py:23-200): main = ``[fF]rame*.jpg``, bathy =
  ``patch_30m_combined_bathy.png`` or ``combined_bathy.jpg``, SSS =
  max-nonzero non-patch ``*SSS*``; folders with missing/empty images are
  skipped; per-image failures fall back to black images.

Samples are NHWC float32 numpy arrays (TPU-native), not CHW tensors.
"""
from __future__ import annotations

import glob
import logging
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from sklearn.preprocessing import LabelEncoder

from multimodal_auv_tpu.config import IMAGE_SIZE
from multimodal_auv_tpu.data import transforms as T

logger = logging.getLogger(__name__)

_PATCH_TYPE_SIZE_RE = re.compile(r"patch_(\d+m?)_")


def resolve_patch_size(patch_type, kind: str, available) -> "str | None":
    """The reference's patch-type resolution rule (train/multimodal.py:
    93-102), shared by the epoch loops (tensor-level select_patch) and the
    packed-training packer (path-level selection) so the two can never
    diverge: returns the size key to take from ``available``, or None for
    the full-resolution fallback (``patch_30_<kind>`` aliases the full
    tensor)."""
    if not patch_type or patch_type == f"patch_30_{kind}":
        return None
    s = str(patch_type)
    m = _PATCH_TYPE_SIZE_RE.match(s)
    if m and m.group(1) in available:
        return m.group(1)
    # Reference dict-key form: its patch dicts are keyed by BARE sizes
    # ('10m', train/multimodal.py:299), so patch_type='10m' selects the
    # 10m patch there via .get(patch_type) — accept that spelling too.
    # (The 'patch_10m_bathy' spelling above is this repo's documented
    # fix: in the reference it misses the dict and silently falls back
    # to the full-resolution tensor.)
    if s in available:
        return s
    return None


_BATHY_PATCH_RE = re.compile(r"patch_(\d+m)_combined_bathy\.png")
_SSS_PATCH_RE = re.compile(r"patch_(\d+m)_.*_SSS\.(png|jpg)")
_SSS_SUFFIXES = (".png", ".jpg", ".jpeg", ".tif", ".bmp")


class MultimodalFolderDataset:
    """Labeled multimodal dataset (training/eval)."""

    def __init__(self, root_dir: str, transform=None,
                 image_size: int = IMAGE_SIZE):
        self.image_size = image_size
        self.root_dir = root_dir
        self.data_paths: List[Dict] = []
        self.all_discovered_patch_sizes: set = set()
        all_labels: List[str] = []

        for folder in os.listdir(root_dir):
            folder_path = os.path.join(root_dir, folder)
            if not os.path.isdir(folder_path):
                continue

            try:
                mains = glob.glob(os.path.join(folder_path, "*frame*.jpg"))
                if not mains:
                    raise FileNotFoundError("Main image not found")
                main_image = mains[0]

                sss_candidates = [
                    os.path.join(folder_path, f) for f in os.listdir(folder_path)
                    if "SSS" in f and "patch_" not in f
                ]
                if not sss_candidates:
                    raise FileNotFoundError("SSS image not found")
                sss_image = max(sss_candidates,
                                key=lambda p: T.image_nonzero_count(p, "L"))
            except Exception as e:
                logger.debug("Skipping %s (main/SSS): %s", folder_path, e)
                continue

            try:
                label_files = [f for f in os.listdir(folder_path)
                               if f.endswith(".txt") and not f.startswith("_")]
                if not label_files:
                    raise FileNotFoundError("Label file not found")
                label_files.sort(
                    key=lambda x: os.path.getmtime(os.path.join(folder_path, x)),
                    reverse=True)
                label = os.path.splitext(label_files[0])[0]
            except Exception as e:
                logger.debug("Skipping %s (label): %s", folder_path, e)
                continue

            bathy_image = os.path.join(folder_path, "combined_rgb_bathymetry.jpg")
            if not os.path.exists(bathy_image):
                logger.debug("Skipping %s (no combined_rgb_bathymetry.jpg)",
                             folder_path)
                continue

            patch_bathy_found: Dict[str, str] = {}
            patch_sss_found: Dict[str, str] = {}
            for file in os.listdir(folder_path):
                m = _BATHY_PATCH_RE.match(file)
                s = _SSS_PATCH_RE.match(file)
                if m:
                    patch_bathy_found[m.group(1)] = os.path.join(folder_path, file)
                    self.all_discovered_patch_sizes.add(m.group(1))
                elif s:
                    patch_sss_found[s.group(1)] = os.path.join(folder_path, file)
                    self.all_discovered_patch_sizes.add(s.group(1))

            if not patch_bathy_found and not patch_sss_found:
                logger.debug("Skipping %s (no patches)", folder_path)
                continue

            if not os.path.exists(os.path.join(folder_path, "normalised_meta.csv")):
                logger.debug("Skipping %s (no normalised_meta.csv)", folder_path)
                continue

            self.data_paths.append({
                "main_image": main_image,
                "bathy_image": bathy_image,
                "sss_image": sss_image,
                "patch_bathy": patch_bathy_found,
                "patch_sss": patch_sss_found,
            })
            all_labels.append(label)

        if not self.data_paths:
            raise RuntimeError(
                "No valid data samples found in root_dir. "
                "Check your data paths and filters.")

        self.label_encoder = LabelEncoder()
        self.label_encoder.fit(all_labels)
        self.labels = self.label_encoder.transform(all_labels)
        self.all_discovered_patch_sizes = sorted(self.all_discovered_patch_sizes)
        logger.info("Discovered patch sizes: %s", self.all_discovered_patch_sizes)

    @property
    def num_classes(self) -> int:
        return len(self.label_encoder.classes_)

    def __len__(self):
        return len(self.data_paths)

    def __getitem__(self, idx: int) -> Dict:
        paths = self.data_paths[idx]
        sz = (self.image_size, self.image_size)
        sample = {
            "main_image": T.load_main_image(paths["main_image"], sz),
            "bathy_image": T.load_image(paths["bathy_image"], "RGB", sz),
            "sss_image": T.load_image(paths["sss_image"], "L", sz),
            "label": np.int32(self.labels[idx]),
        }
        patch_bathy, patch_sss = {}, {}
        for size in self.all_discovered_patch_sizes:
            bp = paths["patch_bathy"].get(size)
            if bp and os.path.exists(bp):
                try:
                    patch_bathy[size] = T.load_image(bp, "RGB", sz)
                except Exception as e:
                    logger.warning("Error loading patch %s: %s; dummy used", bp, e)
                    patch_bathy[size] = T.zeros(3, self.image_size)
            else:
                patch_bathy[size] = T.zeros(3, self.image_size)

            sp = paths["patch_sss"].get(size)
            if sp and os.path.exists(sp):
                try:
                    patch_sss[size] = T.load_image(sp, "L", sz)
                except Exception as e:
                    logger.warning("Error loading patch %s: %s; dummy used", sp, e)
                    patch_sss[size] = T.zeros(1, self.image_size)
            else:
                patch_sss[size] = T.zeros(1, self.image_size)
        sample["patch_bathy"] = patch_bathy
        sample["patch_sss"] = patch_sss
        return sample


class InferenceFolderDataset:
    """Unlabeled inference dataset."""

    def __init__(self, root_dir: str, transform=None,
                 image_size: int = IMAGE_SIZE):
        self.image_size = image_size
        self.root_dir = root_dir
        self.data: List[Dict[str, str]] = []
        self._load_data()

    # -- scan rules (datasets.py:73-160) -----------------------------------

    def _find_main_image(self, folder_path: str) -> Optional[str]:
        matches = glob.glob(os.path.join(folder_path, "[fF]rame*.jpg"))
        return matches[0] if matches else None

    def _find_sss_image(self, folder_path: str) -> Optional[str]:
        candidates = [
            os.path.join(folder_path, f) for f in os.listdir(folder_path)
            if "SSS" in f and f.lower().endswith(_SSS_SUFFIXES)
            and "patch_" not in f
        ]
        selected, max_nonzero = None, -1
        for p in candidates:
            try:
                n = T.image_nonzero_count(p, "L")
                if n > max_nonzero:
                    max_nonzero, selected = n, p
            except Exception as e:
                logger.warning("Error loading SSS image %s: %s", p, e)
        return selected

    def _find_bathy_image(self, folder_path: str) -> str:
        p1 = os.path.join(folder_path, "patch_30m_combined_bathy.png")
        p2 = os.path.join(folder_path, "combined_bathy.jpg")
        if os.path.exists(p1):
            return p1
        if os.path.exists(p2):
            return p2
        logger.debug("Missing bathy data in %s", folder_path)
        return "empty_image.png"

    def _load_data(self):
        processed, loaded = 0, 0
        for folder in os.listdir(self.root_dir):
            folder_path = os.path.join(self.root_dir, folder)
            if not os.path.isdir(folder_path):
                continue
            processed += 1
            main = self._find_main_image(folder_path)
            sss = self._find_sss_image(folder_path)
            bathy = self._find_bathy_image(folder_path)
            if main is None or sss is None or bathy in (None, "empty_image.png"):
                continue
            paths = [main, sss, bathy]
            if not all(os.path.exists(p) for p in paths):
                continue
            valid = True
            for p in paths:
                try:
                    if T.image_sum(p) == 0:
                        valid = False
                        break
                except Exception as e:
                    logger.warning("Error reading image %s: %s", p, e)
                    valid = False
                    break
            if not valid:
                continue
            self.data.append({"main_image": main, "bathy_image": bathy,
                              "sss_image": sss})
            loaded += 1
        logger.info("Total folders successfully loaded: %d / processed: %d",
                    loaded, processed)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, str]:
        item = self.data[idx]
        name = os.path.basename(item.get("main_image", ""))

        sz = (self.image_size, self.image_size)

        def load(key, path, mode, channels):
            try:
                if key == "main_image":
                    return T.load_main_image(path, sz)
                return T.load_image(path, mode, sz)
            except Exception as e:
                logger.warning("Error loading %s for %s: %s; black image used",
                               path, key, e)
                # a BLACK IMAGE through the standard transform (reference
                # datasets.py:186-193 intent): for main that means the
                # optical normalization applies — which also makes the
                # fallback bit-identical to the packed cache's uint8 zeros
                # after on-chip normalization (data/packing.py)
                z = T.zeros(channels, self.image_size)
                return T.normalize_optical(z) if key == "main_image" else z

        main = load("main_image", item["main_image"], "RGB", 3)
        bathy = load("bathy_image", item["bathy_image"], "RGB", 3)
        sss = load("sss_image", item["sss_image"], "L", 1)
        return main, bathy, sss, name


class ConcatDataset:
    """Minimal torch-free ConcatDataset (inference_data.py:5-22 uses one)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx: int):
        if idx < 0:  # torch ConcatDataset semantics
            idx += len(self)
        if not 0 <= idx < len(self):
            raise IndexError(f"index {idx} out of range for "
                             f"ConcatDataset of length {len(self)}")
        ds = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[ds][idx - int(self._offsets[ds])]

    @property
    def data(self):
        """Chained per-sample path records (for data/packing.py)."""
        out = []
        for d in self.datasets:
            out.extend(getattr(d, "data", []))
        return out
