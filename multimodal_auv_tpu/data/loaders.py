"""Threaded prefetching data loader + dataset splitting.

Replaces torch's DataLoader machinery (/root/reference/src/Multimodal_AUV/
data/loaders.py:19-60) with a thread-pool loader feeding pinned numpy
batches: PIL/cv2 decode release the GIL, the TPU consumes one batch while
workers build the next (double buffering via a bounded queue).

Split semantics are identical: sklearn train_test_split over indices with
test_size=0.2, random_state=42 (loaders.py:12-17).
"""
from __future__ import annotations

import logging
import os
import queue
import threading
from collections import Counter
from typing import Any, Iterator, List, Optional, Sequence

import numpy as np
from sklearn.model_selection import train_test_split

from multimodal_auv_tpu.config import IMAGE_SIZE
from multimodal_auv_tpu.data.datasets import (
    ConcatDataset,
    InferenceFolderDataset,
    MultimodalFolderDataset,
)

logger = logging.getLogger(__name__)


class Subset:
    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]

    # index-DEPENDENT attributes must be re-indexed to the subset —
    # delegating them to the full dataset would silently return all-N
    # labels/records for an n-row split (wrong class weights, wrong
    # fingerprints)
    _REINDEXED = ("labels", "data", "data_paths")

    def __getattr__(self, name):
        if name.startswith("__") or "dataset" not in self.__dict__:
            # dunder lookups (pickle/deepcopy probe __setstate__ etc.
            # before __init__ ran) must fail normally, not recurse through
            # self.dataset -> __getattr__('dataset') -> ...
            raise AttributeError(name)
        if name in self._REINDEXED:
            full = getattr(self.dataset, name)
            return [full[i] for i in self.indices]
        return getattr(self.dataset, name)


def split_indices(n: int, test_size: float = 0.2, random_state: int = 42):
    """The canonical train/test index split. The packed and unpacked
    training paths MUST share this one helper: two diverging copies of
    (test_size, random_state) would silently train the packed path on
    samples the unpacked path holds out (evaluation leak)."""
    return train_test_split(list(range(n)), test_size=test_size,
                            random_state=random_state)


def split_dataset(dataset, test_size: float = 0.2, random_state: int = 42):
    train_idx, test_idx = split_indices(len(dataset), test_size, random_state)
    return Subset(dataset, train_idx), Subset(dataset, test_idx)


def _collate(samples: List[Any]):
    """Stack a list of samples (dicts, tuples, arrays, scalars, strings)."""
    first = samples[0]
    if isinstance(first, dict):
        return {k: _collate([s[k] for s in samples]) for k in first}
    if isinstance(first, tuple):
        return tuple(_collate([s[i] for s in samples]) for i in range(len(first)))
    if isinstance(first, str):
        return list(samples)
    return np.stack([np.asarray(s) for s in samples])


class DataLoader:
    """Iterable over collated numpy batches with threaded prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: Optional[int] = None, drop_last: bool = False,
                 seed: int = 0, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0
        if num_workers is None:
            num_workers = max((os.cpu_count() or 2) - 2, 0)
        self.num_workers = num_workers

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle epoch (torch DistributedSampler convention). The
        epoch orchestrators call this with the ABSOLUTE epoch index before
        each epoch: a freshly constructed loader in a resumed process then
        replays the same shuffle order as an uninterrupted run, instead of
        restarting its iteration counter at 0 (which would both diverge
        from the uninterrupted trajectory and repeat epoch 0's sample
        order). Standalone iteration keeps the auto-incrementing counter."""
        self._epoch = int(epoch)

    def _index_batches(self) -> List[List[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        batches = [idx[i:i + self.batch_size].tolist()
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def _load_samples(self, b: List[int], mapper) -> List[Any]:
        """Materialise the samples for one index batch. ``mapper`` is
        ``map`` (num_workers=0) or a thread pool's ``map``. Subclasses
        (HostShardLoader) override this to decode only the rows this host
        owns."""
        return list(mapper(self.dataset.__getitem__, b))

    def __iter__(self) -> Iterator:
        batches = self._index_batches()
        self._epoch += 1
        if self.num_workers == 0:
            for b in batches:
                yield _collate(self._load_samples(b, map))
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # A plain q.put would park forever on the full bounded queue
            # when the consumer abandons iteration (strict_errors raise,
            # early break): stop.set() runs in the generator's finally but
            # the blocked put never observes it — leaking a daemon thread
            # + prefetch+1 collated image batches per abandoned epoch.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    try:
                        samples = self._load_samples(b, pool.map)
                        if not put(_collate(samples)):
                            return
                    except Exception as e:  # propagate to consumer
                        put(e)
                        return
            put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


class HostShardLoader(DataLoader):
    """Multi-host data feeding: the torch-DistributedSampler analogue for
    the SPMD training pipelines (SURVEY.md §2.8; the reference's dormant
    DDP path, train/multimodal.py:109-110).

    Every host iterates the SAME global index order (same seed + pinned
    shuffle epoch, so the epoch loops stay bit-reproducible), but decodes
    ONLY its contiguous row-slice ``[pi*B/P, (pi+1)*B/P)`` of each global
    batch — IO and decode scale with 1/P. Yielded batches are
    GLOBAL-shaped: owned rows carry real pixels, unowned image rows are
    zero-filled placeholders (labels are filled globally from
    ``dataset.labels`` without any decode, so eval ledgers see true
    labels). The multi-host step wrappers
    (parallel/distributed.py::wrap_*_step_multihost) slice the owned rows
    back out and assemble the true global device batch via
    ``jax.make_array_from_process_local_data`` — placeholder rows never
    reach a device. Row slots this host owns but the ragged tail leaves
    empty are padded by the epoch loops' ``_pad_batch`` and masked out of
    every reduction, so pad/placeholder CONTENT cannot affect results."""

    def __init__(self, dataset, batch_size: int, *,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None, **kw):
        super().__init__(dataset, batch_size, **kw)
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
        self._zero_template = None

    @classmethod
    def from_loader(cls, loader: DataLoader,
                    process_index: Optional[int] = None,
                    process_count: Optional[int] = None) -> "HostShardLoader":
        out = cls(loader.dataset, loader.batch_size, shuffle=loader.shuffle,
                  num_workers=loader.num_workers, drop_last=loader.drop_last,
                  seed=loader.seed, prefetch=loader.prefetch,
                  process_index=process_index, process_count=process_count)
        out._epoch = loader._epoch
        return out

    def _placeholder(self, label) -> Any:
        if self._zero_template is None:
            import jax

            self._zero_template = jax.tree_util.tree_map(
                np.zeros_like, self.dataset[0])
        out = dict(self._zero_template)  # nested arrays shared (read-only)
        out["label"] = np.int32(label)
        return out

    def _load_samples(self, b: List[int], mapper) -> List[Any]:
        lo = self.process_index * self.rows_per_host
        hi = min(lo + self.rows_per_host, len(b))
        owned = self._load_owned(b[lo:hi] if lo < len(b) else [], mapper)
        labels = getattr(self.dataset, "labels", None)
        return [
            owned[j - lo] if lo <= j < hi
            else self._placeholder(labels[i] if labels is not None else 0)
            for j, i in enumerate(b)
        ]

    def _load_owned(self, idx: List[int], mapper) -> List[Any]:
        return list(mapper(self.dataset.__getitem__, idx))


def prepare_datasets_and_loaders(
    root_dir: str,
    batch_size_unimodal: int = 8,
    batch_size_multimodal: int = 12,
    num_workers: Optional[int] = None,
    image_size: Optional[int] = None,
):
    """Reference parity (loaders.py:19-60): builds the labeled dataset, logs
    the class histogram, splits 80/20, and returns 4 loaders
    (unimodal/multimodal x train/test), num_classes, and the dataset."""
    kw = {"image_size": image_size} if image_size else {}
    dataset = MultimodalFolderDataset(root_dir, **kw)
    counts = Counter(dataset.label_encoder.inverse_transform(dataset.labels))
    logger.info("Class histogram: %s", dict(counts))
    num_classes = dataset.num_classes

    train_ds, test_ds = split_dataset(dataset)
    train_loader_uni = DataLoader(train_ds, batch_size_unimodal, shuffle=True,
                                  num_workers=num_workers)
    test_loader_uni = DataLoader(test_ds, batch_size_unimodal, shuffle=False,
                                 num_workers=num_workers)
    train_loader_multi = DataLoader(train_ds, batch_size_multimodal, shuffle=True,
                                    num_workers=num_workers)
    test_loader_multi = DataLoader(test_ds, batch_size_multimodal, shuffle=False,
                                   num_workers=num_workers)
    return (train_loader_uni, test_loader_uni, train_loader_multi,
            test_loader_multi, num_classes, dataset)


def encode_labels(labels: Sequence[str]):
    """Stray LabelEncoder helper kept for parity (loaders.py:62-66)."""
    from sklearn.preprocessing import LabelEncoder

    enc = LabelEncoder()
    return enc.fit_transform(labels), enc


def prepare_inference_datasets_and_loaders(
    dirs: Sequence[str], batch_size: int = 4,
    num_workers: Optional[int] = None,
    image_size: Optional[int] = None) -> DataLoader:
    """Concat N inference dirs into one unshuffled loader
    (inference/inference_data.py:5-22 used exactly two dirs)."""
    kw = {"image_size": image_size} if image_size else {}
    datasets = [InferenceFolderDataset(d, **kw) for d in dirs]
    ds = datasets[0] if len(datasets) == 1 else ConcatDataset(datasets)
    return DataLoader(ds, batch_size, shuffle=False, num_workers=num_workers)


def prepare_inference_dataloader(data_directory: str, batch_size: int = 4,
                                 num_workers: Optional[int] = None,
                                 image_size: Optional[int] = None) -> DataLoader:
    """Single-dir variant (Examples/Example_Inference_model.py:18-41)."""
    return prepare_inference_datasets_and_loaders([data_directory], batch_size,
                                                  num_workers,
                                                  image_size=image_size)


def prepare_packed_train_loaders(
    root_dir: str,
    batch_size: int,
    bathy_patch_type: Optional[str] = None,
    sss_patch_type: Optional[str] = None,
    cache_dir: Optional[str] = None,
    seed: int = 0,
    image_size: Optional[int] = None,
):
    """Decode-once training loaders: pack the labeled dataset for a fixed
    patch-type pair (data/packing.py) and serve uint8 dict batches from
    memmaps with the SAME 80/20 split (test_size=0.2, random_state=42) as
    `prepare_datasets_and_loaders`. Pair with steps built with
    ``packed_inputs=True``. Returns (train_batches, test_batches,
    num_classes, dataset)."""
    from multimodal_auv_tpu.data.packing import (
        PackedTrainBatches,
        dataset_fingerprint,
        load_packed_training,
        pack_training_dataset,
    )

    kw = {"image_size": image_size} if image_size else {}
    dataset = MultimodalFolderDataset(root_dir, **kw)
    counts = Counter(dataset.label_encoder.inverse_transform(dataset.labels))
    logger.info("Class histogram: %s", dict(counts))
    sz = image_size or IMAGE_SIZE
    cache = cache_dir or os.path.join(root_dir, ".packed_train_cache")
    out = os.path.join(
        cache,
        f"{bathy_patch_type or 'full'}_{sss_patch_type or 'full'}_{sz}")

    def _fresh(p) -> bool:
        return (p["main"].shape[0] == len(dataset)
                and p["meta"].get("fingerprint") == dataset_fingerprint(dataset))

    import jax

    if jax.process_count() > 1:
        # multi-host: the pack cache is a COLLECTIVE resource on the shared
        # filesystem — single-writer (process 0 packs or repacks), barrier,
        # then every process memmaps the same files. Concurrent packers
        # would race on the memmap writes.
        from multimodal_auv_tpu.parallel.distributed import (
            _next_barrier_name,
            assert_same_across_processes,
            barrier,
            is_coordinator,
        )

        assert_same_across_processes("packed_train_cache", out)
        if is_coordinator():
            if not os.path.exists(os.path.join(out, "meta.json")):
                pack_training_dataset(dataset, out, bathy_patch_type,
                                      sss_patch_type, size=sz)
            elif not _fresh(load_packed_training(out)):
                logger.warning("Stale packed cache %s (content mismatch); "
                               "repacking", out)
                pack_training_dataset(dataset, out, bathy_patch_type,
                                      sss_patch_type, size=sz)
        barrier(_next_barrier_name("packed_cache"))
        packed = load_packed_training(out)
        if not _fresh(packed):
            raise RuntimeError(
                f"packed cache {out} is stale on process "
                f"{jax.process_index()} after the coordinator packed it — "
                f"the hosts do not see the same dataset/shared filesystem")
    else:
        if not os.path.exists(os.path.join(out, "meta.json")):
            pack_training_dataset(dataset, out, bathy_patch_type,
                                  sss_patch_type, size=sz)
        packed = load_packed_training(out)
        if not _fresh(packed):
            logger.warning("Stale packed cache %s (content mismatch); "
                           "repacking", out)
            packed = pack_training_dataset(dataset, out, bathy_patch_type,
                                           sss_patch_type, size=sz)

    train_idx, test_idx = split_indices(len(dataset))
    train = PackedTrainBatches(packed, batch_size, train_idx, shuffle=True,
                               seed=seed)
    test = PackedTrainBatches(packed, batch_size, test_idx)
    return train, test, dataset.num_classes, dataset
