"""Dataset packing: decode once, feed forever.

The reference decodes + resizes every PIL image on every epoch / sweep
configuration (SURVEY.md §3.1 "disk I/O hot loop #0"). ``pack_*`` walks a
dataset once (threaded decode, C++ resize fast path when built) into
uint8 memmap arrays shaped (N, 256, 256, C); ``PackedBatches`` then serves
device-ready uint8 batches whose normalization happens on-chip
(ops/preprocess.py). Epoch 2+ costs pure memory bandwidth.
"""
from __future__ import annotations

import json
import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from multimodal_auv_tpu.config import IMAGE_SIZE

logger = logging.getLogger(__name__)


def _decode_u8(path: str, mode: str, size: int) -> np.ndarray:
    """uint8 decode + resize through transforms.load_image_u8 — the SAME
    code path the unpacked loader's load_image wraps with /255, so the
    packed caches store exactly the pixels the unpacked path feeds for
    every modality (an earlier local copy silently diverged on resized
    SSS 'L' images: native no-antialias vs PIL antialiased bilinear)."""
    from multimodal_auv_tpu.data.transforms import load_image_u8

    return load_image_u8(path, mode, (size, size))


def _hash_paths(h, paths) -> None:
    """Fold path|mtime_ns|size (or path|missing) of each path into ``h`` —
    the one stat-and-hash loop behind both staleness fingerprints."""
    for p in paths:
        try:
            st = os.stat(p)
            h.update(f"{p}|{st.st_mtime_ns}|{st.st_size};".encode())
        except OSError:
            h.update(f"{p}|missing;".encode())


def inference_fingerprint(dataset) -> str:
    """Content fingerprint of an InferenceFolderDataset (or a ConcatDataset
    of them): sha1 over every referenced path + mtime/size in sample order.
    Stored in the packed cache's pack_meta.json — a mismatch means the
    cache was packed from a different directory list or on-disk state and
    silently serving it would emit rows for the WRONG survey."""
    import hashlib

    h = hashlib.sha1()
    for it in dataset.data:
        _hash_paths(h, (it["main_image"], it["bathy_image"], it["sss_image"]))
    return h.hexdigest()


def pack_inference_dataset(dataset, out_dir: str, size: int = IMAGE_SIZE,
                           workers: Optional[int] = None) -> Dict[str, object]:
    """Pack an InferenceFolderDataset into {main,bathy,sss}.npy + names."""
    os.makedirs(out_dir, exist_ok=True)
    n = len(dataset)
    main = np.lib.format.open_memmap(
        os.path.join(out_dir, "main.npy"), mode="w+", dtype=np.uint8,
        shape=(n, size, size, 3))
    bathy = np.lib.format.open_memmap(
        os.path.join(out_dir, "bathy.npy"), mode="w+", dtype=np.uint8,
        shape=(n, size, size, 3))
    sss = np.lib.format.open_memmap(
        os.path.join(out_dir, "sss.npy"), mode="w+", dtype=np.uint8,
        shape=(n, size, size, 1))
    names = []

    items = [dataset.data[i] for i in range(n)]

    def work(i):
        # _decode_or_zeros, not bare _decode_u8: a file truncated/removed
        # between the dataset scan and the pack must degrade to the same
        # zeros dummy the unpacked InferenceFolderDataset would feed — not
        # abort the whole pack and strand partial .npy files in the cache.
        it = items[i]
        main[i] = _decode_or_zeros(it["main_image"], "RGB", size)
        bathy[i] = _decode_or_zeros(it["bathy_image"], "RGB", size)
        sss[i] = _decode_or_zeros(it["sss_image"], "L", size)
        return os.path.basename(it["main_image"])

    workers = workers or max((os.cpu_count() or 2) - 2, 1)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        names = list(pool.map(work, range(n)))

    with open(os.path.join(out_dir, "names.json"), "w") as f:
        json.dump(names, f)
    with open(os.path.join(out_dir, "pack_meta.json"), "w") as f:
        json.dump({"size": size,
                   "fingerprint": inference_fingerprint(dataset)}, f)
    main.flush(); bathy.flush(); sss.flush()
    logger.info("Packed %d samples into %s", n, out_dir)
    return {"main": main, "bathy": bathy, "sss": sss, "names": names}


def load_packed(out_dir: str) -> Dict[str, object]:
    return {
        "main": np.load(os.path.join(out_dir, "main.npy"), mmap_mode="r"),
        "bathy": np.load(os.path.join(out_dir, "bathy.npy"), mmap_mode="r"),
        "sss": np.load(os.path.join(out_dir, "sss.npy"), mmap_mode="r"),
        "names": json.load(open(os.path.join(out_dir, "names.json"))),
    }


class PackedBatches:
    """Iterate uint8 batches (main, bathy, sss, names) from packed arrays.

    The final batch is RAGGED (no padding, no valid-count) — consumers
    feeding a fixed-shape jitted step or AOT artifact must zero-pad the
    tail and build the validity mask themselves, as
    engine.predict.multimodal_predict_and_save_packed does."""

    def __init__(self, packed: Dict[str, object], batch_size: int):
        self.packed = packed
        self.batch_size = batch_size
        self.n = packed["main"].shape[0]

    def __len__(self):
        return -(-self.n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray, list]]:
        bs = self.batch_size
        for i in range(0, self.n, bs):
            sl = slice(i, min(i + bs, self.n))
            main = np.asarray(self.packed["main"][sl])
            bathy = np.asarray(self.packed["bathy"][sl])
            sss = np.asarray(self.packed["sss"][sl])
            names = self.packed["names"][sl]
            yield main, bathy, sss, list(names)


def _select_patch_path(item: Dict, patch_type: Optional[str], kind: str,
                       discovered) -> Optional[str]:
    """Path-level twin of engine.loops.select_patch: both delegate to
    data.datasets.resolve_patch_size — against the DATASET-WIDE discovered
    size set, exactly like MultimodalFolderDataset.__getitem__ (which builds
    an entry for every discovered size) — so the packed cache can never
    select different files than the unpacked loader. Returns None when the
    resolved size has no file for THIS item: the unpacked path feeds a
    zeros dummy there (datasets.py:180,190), and so must the pack."""
    from multimodal_auv_tpu.data.datasets import resolve_patch_size

    full = item["bathy_image"] if kind == "bathy" else item["sss_image"]
    patches = item.get(f"patch_{kind}", {}) or {}
    size = resolve_patch_size(patch_type, kind, discovered)
    if size is None:
        return full
    return patches.get(size)


def _decode_or_zeros(path: Optional[str], mode: str, size: int) -> np.ndarray:
    """Decode one image, or produce the uint8 BLACK IMAGE the unpacked
    dataset's fallbacks feed: for a missing per-item patch (path None) and
    for an unreadable file (warn + zeros — one corrupt image must not
    abort the whole pack). The stored uint8 zeros go through the standard
    on-chip normalization, which matches the unpacked fallback exactly:
    bathy/sss/patches are identity (/255 of zeros = zeros), and the main
    image's optical normalization is applied by the unpacked fallback too
    (InferenceFolderDataset feeds a *normalized* black image). The
    training-side unpacked path has NO fallback for main/bathy/sss (it
    raises, reference datasets.py:347-354 parity) — there the packed
    zeros-degradation is a documented divergence requested for pack
    robustness (ADVICE r2), logged per file."""
    channels = 3 if mode == "RGB" else 1
    if path is None:
        return np.zeros((size, size, channels), np.uint8)
    try:
        return _decode_u8(path, mode, size)
    except Exception as e:
        logger.warning("Error decoding %s: %s; zeros dummy used", path, e)
        return np.zeros((size, size, channels), np.uint8)


def dataset_fingerprint(dataset) -> str:
    """Content fingerprint of a MultimodalFolderDataset: sha1 over every
    referenced path + its mtime/size, plus the encoded labels. A packed
    cache whose stored fingerprint differs was built from different
    on-disk data (even at the same sample count) and must be repacked."""
    import hashlib

    h = hashlib.sha1()
    for it in dataset.data_paths:
        paths = [it["main_image"], it["bathy_image"], it["sss_image"]]
        for d in (it.get("patch_bathy") or {}, it.get("patch_sss") or {}):
            paths.extend(d[k] for k in sorted(d))
        _hash_paths(h, paths)
    h.update(np.asarray(dataset.labels, np.int64).tobytes())
    return h.hexdigest()


def pack_training_dataset(dataset, out_dir: str,
                          bathy_patch_type: Optional[str] = None,
                          sss_patch_type: Optional[str] = None,
                          size: int = IMAGE_SIZE,
                          workers: Optional[int] = None) -> Dict[str, object]:
    """Pack a MultimodalFolderDataset for a FIXED patch-type pair into
    uint8 memmaps + int labels: decode-once training epochs. The patch
    selection the train loop would do per batch (select_patch) is resolved
    to paths here, so epochs 2+ of training cost memory bandwidth instead
    of a JPEG decode per sample per epoch (the reference pays the decode
    every epoch, SURVEY §3.1)."""
    os.makedirs(out_dir, exist_ok=True)
    n = len(dataset)
    main = np.lib.format.open_memmap(
        os.path.join(out_dir, "main.npy"), mode="w+", dtype=np.uint8,
        shape=(n, size, size, 3))
    bathy = np.lib.format.open_memmap(
        os.path.join(out_dir, "bathy.npy"), mode="w+", dtype=np.uint8,
        shape=(n, size, size, 3))
    sss = np.lib.format.open_memmap(
        os.path.join(out_dir, "sss.npy"), mode="w+", dtype=np.uint8,
        shape=(n, size, size, 1))

    items = [dataset.data_paths[i] for i in range(n)]
    discovered = getattr(dataset, "all_discovered_patch_sizes", ())

    def work(i):
        it = items[i]
        main[i] = _decode_or_zeros(it["main_image"], "RGB", size)
        bathy[i] = _decode_or_zeros(
            _select_patch_path(it, bathy_patch_type, "bathy", discovered),
            "RGB", size)
        sss[i] = _decode_or_zeros(
            _select_patch_path(it, sss_patch_type, "sss", discovered),
            "L", size)

    workers = workers or max((os.cpu_count() or 2) - 2, 1)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(work, range(n)))

    labels = np.asarray(dataset.labels, np.int32)
    np.save(os.path.join(out_dir, "labels.npy"), labels)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"bathy_patch_type": bathy_patch_type,
                   "sss_patch_type": sss_patch_type,
                   "classes": [str(c) for c in dataset.label_encoder.classes_],
                   "fingerprint": dataset_fingerprint(dataset)},
                  f)
    main.flush(); bathy.flush(); sss.flush()
    logger.info("Packed %d training samples into %s", n, out_dir)
    return load_packed_training(out_dir)


def load_packed_training(out_dir: str) -> Dict[str, object]:
    return {
        "main": np.load(os.path.join(out_dir, "main.npy"), mmap_mode="r"),
        "bathy": np.load(os.path.join(out_dir, "bathy.npy"), mmap_mode="r"),
        "sss": np.load(os.path.join(out_dir, "sss.npy"), mmap_mode="r"),
        "labels": np.load(os.path.join(out_dir, "labels.npy")),
        "meta": json.load(open(os.path.join(out_dir, "meta.json"))),
    }


class PackedTrainBatches:
    """Epoch iterator over a packed training set (optionally a subset of
    indices, for the 80/20 split). Yields dict batches in the epoch loops'
    schema — with UINT8 image arrays, for steps built with
    ``packed_inputs=True`` (normalization happens on-chip). Reshuffles
    each epoch when ``shuffle`` (torch DataLoader(shuffle=True) parity)."""

    def __init__(self, packed: Dict[str, object], batch_size: int,
                 indices=None, shuffle: bool = False, seed: int = 0):
        self.packed = packed
        self.batch_size = batch_size
        self.indices = np.asarray(
            indices if indices is not None
            else np.arange(packed["main"].shape[0]))
        self.shuffle = shuffle
        self._epoch = 0
        self._seed = seed

    def __len__(self):
        return -(-len(self.indices) // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle epoch to an absolute index (same contract as
        DataLoader.set_epoch — resume-reproducible shuffles)."""
        self._epoch = int(epoch)

    def __iter__(self):
        idx = self.indices
        if self.shuffle:
            rng = np.random.default_rng(self._seed + self._epoch)
            idx = rng.permutation(idx)
            self._epoch += 1
        bs = self.batch_size
        for i in range(0, len(idx), bs):
            yield self._materialize(np.sort(idx[i:i + bs]))

    def _materialize(self, take: np.ndarray) -> Dict[str, np.ndarray]:
        """Read the batch rows out of the memmaps (hook: the multi-host
        subclass reads only its owned row-slice)."""
        return {
            "main_image": np.asarray(self.packed["main"][take]),
            "bathy_image": np.asarray(self.packed["bathy"][take]),
            "sss_image": np.asarray(self.packed["sss"][take]),
            "label": np.asarray(self.packed["labels"][take], np.int32),
        }


class HostShardPackedBatches(PackedTrainBatches):
    """Multi-host packed feeding: the decode-once memmap loader's twin of
    ``data/loaders.py::HostShardLoader`` (round-4 verdict #2 — the
    reference's DataParallel applied regardless of loader,
    /root/reference/src/Multimodal_AUV/utils/device.py:17-19; here the
    fastest loader must not drop out of the multi-host story).

    Every host iterates the SAME seeded global batch order, but reads
    ONLY its contiguous row-slice ``[pi*B/P, (pi+1)*B/P)`` of each global
    batch from the image memmaps — page-ins and memory traffic scale with
    1/P. Yielded batches stay GLOBAL-shaped: unowned image rows are
    zero-filled placeholders; labels are filled globally from the
    in-memory labels array (no image read), so eval ledgers see true
    labels. The multi-host step wrappers
    (parallel/distributed.py::wrap_*_step_multihost) slice the owned rows
    back out and assemble the true global device batch — placeholder rows
    never reach a device, and ragged-tail slots are padded + masked by
    the epoch loops exactly as in the single-host path."""

    def __init__(self, packed: Dict[str, object], batch_size: int,
                 indices=None, shuffle: bool = False, seed: int = 0,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        super().__init__(packed, batch_size, indices, shuffle, seed)
        import jax

        pi = jax.process_index() if process_index is None else process_index
        pc = jax.process_count() if process_count is None else process_count
        if batch_size % pc:
            raise ValueError(
                f"batch_size ({batch_size}) must be divisible by the "
                f"process count ({pc}) — every host feeds an equal slice "
                f"of each global batch")
        self.process_index, self.process_count = pi, pc
        self.rows_per_host = batch_size // pc

    @classmethod
    def from_batches(cls, b: PackedTrainBatches,
                     process_index: Optional[int] = None,
                     process_count: Optional[int] = None
                     ) -> "HostShardPackedBatches":
        out = cls(b.packed, b.batch_size, b.indices, shuffle=b.shuffle,
                  seed=b._seed, process_index=process_index,
                  process_count=process_count)
        out._epoch = b._epoch
        return out

    def _materialize(self, take: np.ndarray) -> Dict[str, np.ndarray]:
        n = len(take)
        lo = self.process_index * self.rows_per_host
        hi = min(lo + self.rows_per_host, n)
        own = take[lo:hi] if lo < n else take[:0]
        batch = {}
        for out_key, in_key in (("main_image", "main"),
                                ("bathy_image", "bathy"),
                                ("sss_image", "sss")):
            mm = self.packed[in_key]
            arr = np.zeros((n,) + tuple(mm.shape[1:]), mm.dtype)
            if len(own):
                arr[lo:hi] = mm[own]
            batch[out_key] = arr
        batch["label"] = np.asarray(self.packed["labels"][take], np.int32)
        return batch
