"""Dataset + loader tests on real fixture trees (richer than the reference's
fully-mocked /root/reference/unittests/test_data.py)."""
import os

import numpy as np
import pytest

from multimodal_auv_tpu.data.datasets import (
    InferenceFolderDataset,
    MultimodalFolderDataset,
)
from multimodal_auv_tpu.data.loaders import (
    DataLoader,
    prepare_datasets_and_loaders,
    prepare_inference_dataloader,
    split_dataset,
)
from tests.fixtures.make_tree import (
    gray,
    make_inference_tree,
    make_training_tree,
    rgb,
)


@pytest.fixture(scope="module")
def train_tree(tmp_path_factory):
    return make_training_tree(str(tmp_path_factory.mktemp("train")), n_samples=6)


@pytest.fixture(scope="module")
def infer_tree(tmp_path_factory):
    return make_inference_tree(str(tmp_path_factory.mktemp("infer")), n_samples=5)


def test_training_dataset_scan_and_getitem(train_tree):
    ds = MultimodalFolderDataset(train_tree)
    assert len(ds) == 6
    assert ds.num_classes == 3
    assert ds.all_discovered_patch_sizes == ["10m", "30m"]
    s = ds[0]
    assert s["main_image"].shape == (256, 256, 3)
    assert s["bathy_image"].shape == (256, 256, 3)
    assert s["sss_image"].shape == (256, 256, 1)
    assert set(s["patch_bathy"]) == {"10m", "30m"}
    assert s["patch_bathy"]["30m"].shape == (256, 256, 3)
    assert s["patch_sss"]["30m"].shape == (256, 256, 1)
    # main image is normalized (values can be negative), others in [0,1]
    assert s["main_image"].min() < 0
    assert 0.0 <= s["bathy_image"].min() and s["bathy_image"].max() <= 1.0


def test_training_dataset_skips_invalid_folders(tmp_path):
    root = make_training_tree(str(tmp_path / "t"), n_samples=3)
    # folder without label txt -> skipped
    bad = os.path.join(root, "bad_sample")
    os.makedirs(bad)
    from PIL import Image

    Image.fromarray(rgb()).save(os.path.join(bad, "frame_9.jpg"))
    Image.fromarray(gray()).save(os.path.join(bad, "x_SSS_9.png"))
    ds = MultimodalFolderDataset(root)
    assert len(ds) == 3


def test_dummy_patch_for_missing_size(tmp_path):
    root = make_training_tree(str(tmp_path / "t"), n_samples=2,
                              patch_sizes=("30m",))
    # add a 10m patch only to sample_000 -> sample_001 gets a dummy
    from PIL import Image

    Image.fromarray(rgb()).save(
        os.path.join(root, "sample_000", "patch_10m_combined_bathy.png"))
    ds = MultimodalFolderDataset(root)
    assert ds.all_discovered_patch_sizes == ["10m", "30m"]
    idx1 = next(i for i, p in enumerate(ds.data_paths)
                if "sample_001" in p["main_image"])
    s1 = ds[idx1]
    assert float(np.abs(s1["patch_bathy"]["10m"]).sum()) == 0.0
    assert float(np.abs(s1["patch_bathy"]["30m"]).sum()) > 0.0


def test_inference_dataset(infer_tree):
    ds = InferenceFolderDataset(infer_tree)
    assert len(ds) == 5
    main, bathy, sss, name = ds[0]
    assert main.shape == (256, 256, 3)
    assert bathy.shape == (256, 256, 3)
    assert sss.shape == (256, 256, 1)
    assert name.startswith("Frame_")


def test_inference_dataset_skips_empty(tmp_path):
    root = make_inference_tree(str(tmp_path / "i"), n_samples=2)
    bad = os.path.join(root, "dive_bad")
    os.makedirs(bad)
    from PIL import Image

    # all-zero main image -> folder rejected
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
        os.path.join(bad, "Frame_0.jpg"))
    Image.fromarray(gray()).save(os.path.join(bad, "a_SSS.png"))
    Image.fromarray(rgb()).save(os.path.join(bad, "patch_30m_combined_bathy.png"))
    ds = InferenceFolderDataset(root)
    assert len(ds) == 2


def test_split_and_loader(train_tree):
    ds = MultimodalFolderDataset(train_tree)
    tr, te = split_dataset(ds)
    assert len(tr) + len(te) == len(ds)
    loader = DataLoader(tr, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert sum(b["label"].shape[0] for b in batches) == len(tr)
    b = batches[0]
    assert b["main_image"].shape == (2, 256, 256, 3)
    assert b["patch_sss"]["30m"].shape == (2, 256, 256, 1)
    assert b["label"].dtype == np.int32


def test_set_epoch_pins_shuffle_order():
    """DataLoader.set_epoch(e) makes a FRESH loader reproduce the shuffle
    order a continuously-iterated loader had at epoch e — the contract the
    epoch orchestrators rely on for resume bit-reproducibility (a resumed
    process constructs new loaders; without the pin they would replay
    epoch 0's order)."""

    class Tiny:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return np.array([i])

    def orders(loader, epochs):
        return [np.concatenate([b.ravel() for b in loader])
                for _ in range(epochs)]

    cont = orders(DataLoader(Tiny(), batch_size=3, shuffle=True,
                             num_workers=0), 3)
    assert not np.array_equal(cont[0], cont[2])  # shuffles actually differ

    fresh = DataLoader(Tiny(), batch_size=3, shuffle=True, num_workers=0)
    fresh.set_epoch(2)
    np.testing.assert_array_equal(np.concatenate(
        [b.ravel() for b in fresh]), cont[2])


def test_packed_batches_set_epoch_pins_shuffle_order():
    from multimodal_auv_tpu.data.packing import PackedTrainBatches

    packed = {"main": np.arange(8 * 2, dtype=np.uint8).reshape(8, 2),
              "bathy": np.zeros((8, 1), np.uint8),
              "sss": np.zeros((8, 1), np.uint8),
              "labels": np.arange(8, dtype=np.int64)}
    def labels(it):
        return np.concatenate([b["label"] for b in it])

    cont = PackedTrainBatches(packed, batch_size=3, shuffle=True)
    seq = [labels(cont) for _ in range(3)]
    fresh = PackedTrainBatches(packed, batch_size=3, shuffle=True)
    fresh.set_epoch(2)
    np.testing.assert_array_equal(labels(fresh), seq[2])


def test_prepare_datasets_and_loaders(train_tree):
    out = prepare_datasets_and_loaders(train_tree, batch_size_unimodal=2,
                                       batch_size_multimodal=3, num_workers=0)
    (tl_u, te_u, tl_m, te_m, num_classes, dataset) = out
    assert num_classes == 3
    assert len(dataset) == 6


def test_inference_loader(infer_tree):
    loader = prepare_inference_dataloader(infer_tree, batch_size=2, num_workers=2)
    batches = list(loader)
    n = sum(len(b[3]) for b in batches)
    assert n == 5
    main, bathy, sss, names = batches[0]
    assert main.shape == (2, 256, 256, 3)
    assert isinstance(names, list) and isinstance(names[0], str)


def test_packed_and_unpacked_split_share_indices():
    """The packed and unpacked training paths MUST hold out the same
    samples (loaders.split_indices is the single source of truth); two
    diverging (test_size, random_state) copies would silently train the
    packed path on the unpacked path's eval set."""
    from multimodal_auv_tpu.data.loaders import split_indices

    tr, te = split_indices(25)
    assert sorted(tr + te) == list(range(25)) and len(te) == 5
    assert [tr, te] == split_indices(25)  # deterministic

    class _DS:
        def __len__(self):
            return 25

    sub_tr, sub_te = split_dataset(_DS())
    assert list(sub_tr.indices) == list(tr)
    assert list(sub_te.indices) == list(te)


def test_resolve_patch_size_accepts_both_spellings():
    """The reference's patch dicts are keyed by BARE sizes ('10m',
    datasets.py:299) and looked up with .get(patch_type), so '10m' selects
    the 10m patch there; 'patch_10m_bathy' is this repo's documented-fix
    spelling (in the reference it misses the dict and silently falls back
    to full-res). Both must resolve; 'patch_30_<kind>' and unknown sizes
    fall back to full (None)."""
    from multimodal_auv_tpu.data.datasets import resolve_patch_size

    avail = {"10m", "20m"}
    assert resolve_patch_size("patch_10m_bathy", "bathy", avail) == "10m"
    assert resolve_patch_size("10m", "bathy", avail) == "10m"
    assert resolve_patch_size("20m", "sss", avail) == "20m"
    assert resolve_patch_size("patch_30_bathy", "bathy", avail) is None
    assert resolve_patch_size("30m", "bathy", avail) is None  # not discovered
    assert resolve_patch_size(None, "bathy", avail) is None
    # reference-config form 'patch_10_bathy' (no m): falls back to full in
    # BOTH stacks (the reference dict has no such key either)
    assert resolve_patch_size("patch_10_bathy", "bathy", avail) is None


def test_loader_worker_exits_when_iteration_abandoned(train_tree):
    """Abandoning iteration mid-epoch (strict_errors raise, early break)
    must terminate the prefetch worker: a plain q.put parked on the full
    bounded queue never observed stop.set(), leaking a daemon thread plus
    prefetch+1 collated image batches per abandoned epoch."""
    import threading
    import time

    ds = MultimodalFolderDataset(train_tree)
    before = threading.active_count()
    for _ in range(3):
        it = iter(DataLoader(ds, batch_size=1, num_workers=2, prefetch=1))
        next(it)  # worker fills the queue and blocks on the next put
        it.close()  # generator finally -> stop.set()
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before + 1, (
        f"{threading.active_count() - before} leaked loader threads")


class _PicklableDS:
    """Module-level so pickle can resolve it (Subset pickling test)."""

    labels = [10, 11, 12, 13]
    data = ["a", "b", "c", "d"]
    other = "shared"

    def __len__(self):
        return 4

    def __getitem__(self, i):
        return self.labels[i]


def test_subset_reindexes_index_dependent_attrs():
    """Subset must re-index labels/data/data_paths to the split — blind
    delegation to the full dataset silently returns all-N rows (wrong
    class weights/fingerprints). Pickling must not recurse."""
    import copy
    import pickle

    from multimodal_auv_tpu.data.loaders import Subset

    sub = Subset(_PicklableDS(), [2, 0])
    assert sub.labels == [12, 10]
    assert sub.data == ["c", "a"]
    assert sub.other == "shared"  # index-independent attrs still delegate
    assert sub[0] == 12
    s2 = pickle.loads(pickle.dumps(sub))  # no RecursionError
    assert s2.indices == [2, 0]
    assert copy.deepcopy(sub).labels == [12, 10]


def test_concat_dataset_negative_indices():
    from multimodal_auv_tpu.data.datasets import ConcatDataset

    class L(list):
        @property
        def data(self):
            return self

    c = ConcatDataset([L([1, 2]), L([3, 4, 5])])
    assert c[-1] == 5 and c[-5] == 1
    import pytest as _pytest
    with _pytest.raises(IndexError):
        c[5]
    with _pytest.raises(IndexError):
        c[-6]


def test_explicit_missing_weights_path_raises(tmp_path):
    """A typo'd --model_weights must fail loudly, not silently fall back
    to the generic hub checkpoint."""
    import pytest as _pytest

    from multimodal_auv_tpu.interop.hub import fetch_pretrained_weights

    with _pytest.raises(FileNotFoundError):
        fetch_pretrained_weights(local_path=str(tmp_path / "nope.pth"))
