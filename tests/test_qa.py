"""Survey-tree QA (dataprep/qa.py).

The load-bearing contract: a folder the report marks ``ok`` is EXACTLY a
folder the dataset will load — the QA tool exists to explain the
datasets' silent skips, so any disagreement makes it lie.
"""
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(__file__))
from fixtures.make_tree import make_inference_tree, make_training_tree  # noqa: E402

from multimodal_auv_tpu.data.datasets import (  # noqa: E402
    InferenceFolderDataset,
    MultimodalFolderDataset,
)
from multimodal_auv_tpu.dataprep.qa import data_check_cli, survey_tree_report  # noqa: E402


def _break_tree(root):
    """Introduce one instance of every skippable defect."""
    s = sorted(os.listdir(root))
    os.remove(os.path.join(root, s[0], "Sand.txt"))          # label
    os.remove(os.path.join(root, s[1], "normalised_meta.csv"))  # meta
    os.remove(os.path.join(root, s[2], "combined_rgb_bathymetry.jpg"))
    for f in os.listdir(os.path.join(root, s[3])):           # patches
        if f.startswith("patch_"):
            os.remove(os.path.join(root, s[3], f))
    for f in os.listdir(os.path.join(root, s[4])):           # main image
        if "frame" in f:
            os.remove(os.path.join(root, s[4], f))


def test_training_report_agrees_with_dataset(tmp_path):
    root = make_training_tree(str(tmp_path / "t"), n_samples=9)
    _break_tree(root)

    rep = survey_tree_report(root, kind="training")
    ds = MultimodalFolderDataset(root)
    ok_folders = sorted(os.path.dirname(d["main_image"])
                        for d in ds.data_paths)
    assert sorted(f.folder for f in rep.folders if f.ok) == ok_folders
    assert rep.n_ok == len(ds) == 4
    # the aggregates match the dataset's own discovery
    assert rep.discovered_patch_sizes == list(ds.all_discovered_patch_sizes)
    assert sum(rep.label_histogram.values()) == len(ds)
    # every defect class is named
    assert set(rep.problem_histogram()) == {
        "missing-label", "missing-meta", "missing-bathy", "missing-patches",
        "missing-main"}


def test_inference_report_agrees_with_dataset(tmp_path):
    root = make_inference_tree(str(tmp_path / "i"), n_samples=5)
    s = sorted(os.listdir(root))
    # inference bathy rule: patch_30m_combined_bathy.png OR combined_bathy.jpg
    for f in os.listdir(os.path.join(root, s[0])):
        if "bathy" in f:
            os.remove(os.path.join(root, s[0], f))
    for f in os.listdir(os.path.join(root, s[1])):
        if "SSS" in f:
            os.remove(os.path.join(root, s[1], f))

    rep = survey_tree_report(root, kind="inference")
    ds = InferenceFolderDataset(root)
    assert rep.n_ok == len(ds) == 3
    assert sorted(f.folder for f in rep.folders if f.ok) == sorted(
        os.path.dirname(d["main_image"]) for d in ds.data)


def test_deep_check_flags_broken_and_black_images(tmp_path):
    root = make_training_tree(str(tmp_path / "d"), n_samples=3)
    s = sorted(os.listdir(root))
    # black main image: loads, but the dataset feeds zeros silently
    black = np.zeros((32, 32, 3), np.uint8)
    main0 = [f for f in os.listdir(os.path.join(root, s[0]))
             if "frame" in f][0]
    Image.fromarray(black).save(os.path.join(root, s[0], main0))
    # truncated main image in folder 1
    main1 = [f for f in os.listdir(os.path.join(root, s[1]))
             if "frame" in f][0]
    p1 = os.path.join(root, s[1], main1)
    open(p1, "wb").write(open(p1, "rb").read()[:40])

    rep = survey_tree_report(root, kind="training", deep=True)
    probs = {f.folder: f.problems for f in rep.folders}
    assert any(p.startswith("zero-image") for p in probs[os.path.join(root, s[0])])
    assert any(p.startswith("broken-image") for p in probs[os.path.join(root, s[1])])
    assert not probs[os.path.join(root, s[2])]
    # deep problems are advisory: the folders still load (zeros fallback)
    assert rep.n_ok == 3


def test_ambiguous_label_is_advisory(tmp_path):
    root = make_training_tree(str(tmp_path / "a"), n_samples=2)
    s = sorted(os.listdir(root))
    extra = os.path.join(root, s[0], "Kelp.txt")
    open(extra, "w").write("Kelp")
    os.utime(extra, (2_000_000_000, 2_000_000_000))  # newest

    rep = survey_tree_report(root, kind="training")
    v = [f for f in rep.folders if f.folder.endswith(s[0])][0]
    assert v.ok and v.label == "Kelp"  # newest-wins, like the dataset
    assert any(p.startswith("ambiguous-label") for p in v.problems)
    ds = MultimodalFolderDataset(root)
    assert "Kelp" in ds.label_encoder.classes_


def test_cli_exit_codes(tmp_path, capsys):
    root = make_training_tree(str(tmp_path / "c"), n_samples=3)
    assert data_check_cli(["--root_dir", root]) == 0
    os.remove(os.path.join(root, sorted(os.listdir(root))[0], "Sand.txt"))
    assert data_check_cli(["--root_dir", root]) == 1
    out = capsys.readouterr().out
    assert "missing-label" in out and "2/3" in out
