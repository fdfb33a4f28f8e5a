"""Packed dataset fast path: decode-once memmaps + uint8 batches +
on-chip normalization parity with the PIL/float path."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_auv_tpu.config import BNNPriorSpec, OPTICAL_MEAN, OPTICAL_STD
from multimodal_auv_tpu.data.datasets import InferenceFolderDataset
from multimodal_auv_tpu.data.packing import (
    PackedBatches,
    load_packed,
    pack_inference_dataset,
)
from multimodal_auv_tpu.models.model_utils import ArchConfig
from multimodal_auv_tpu.ops.preprocess import normalize_images, normalize_optical
from tests.fixtures.make_tree import make_inference_tree


def test_pack_and_iterate(tmp_path):
    root = make_inference_tree(str(tmp_path / "dives"), n_samples=5)
    ds = InferenceFolderDataset(root)
    out = pack_inference_dataset(ds, str(tmp_path / "packed"))
    assert out["main"].shape == (5, 256, 256, 3)
    assert out["sss"].shape == (5, 256, 256, 1)
    assert len(out["names"]) == 5

    packed = load_packed(str(tmp_path / "packed"))
    batches = list(PackedBatches(packed, batch_size=2))
    assert len(batches) == 3
    assert batches[0][0].dtype == np.uint8
    assert len(batches[-1][3]) == 1  # ragged tail reported

    # uint8 content matches the float pipeline within rounding
    main_f, bathy_f, sss_f, name = ds[0]
    idx = packed["names"].index(name)
    denorm = np.asarray(main_f) * np.asarray(OPTICAL_STD) + np.asarray(OPTICAL_MEAN)
    np.testing.assert_allclose(packed["main"][idx] / 255.0, denorm, atol=2 / 255.0)


def test_on_chip_normalization_parity():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 8, 8, 3), np.uint8)
    on_chip = np.asarray(normalize_optical(jnp.asarray(u8)))
    host = (u8.astype(np.float32) / 255.0 - np.asarray(OPTICAL_MEAN,
                                                       np.float32)) / \
        np.asarray(OPTICAL_STD, np.float32)
    np.testing.assert_allclose(on_chip, host, rtol=1e-4, atol=1e-6)
    # identity normalization (bathy/SSS): plain /255
    plain = np.asarray(normalize_images(jnp.asarray(u8)))
    np.testing.assert_allclose(plain, u8 / 255.0, rtol=1e-6)


def test_packed_predict_csv(tmp_path):
    from multimodal_auv_tpu.engine.predict import (
        multimodal_predict_and_save,
        multimodal_predict_and_save_packed,
    )
    from multimodal_auv_tpu.data.loaders import prepare_inference_dataloader
    from multimodal_auv_tpu.models.model_utils import make_multimodal_bundle

    root = make_inference_tree(str(tmp_path / "dives"), n_samples=4)
    ds = InferenceFolderDataset(root)
    pack_inference_dataset(ds, str(tmp_path / "packed"))
    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    ArchConfig.micro(image_size=64))
    csv_packed = str(tmp_path / "packed.csv")
    multimodal_predict_and_save_packed(bundle, str(tmp_path / "packed"),
                                       csv_packed, num_mc_samples=2,
                                       batch_size=2)
    rows = open(csv_packed).read().strip().split("\n")
    assert len(rows) == 5
    assert rows[0].startswith("Image Name,Predicted Class")

    # regular path over the same data agrees on the schema + row count
    loader = prepare_inference_dataloader(root, batch_size=2)
    csv_reg = str(tmp_path / "reg.csv")
    multimodal_predict_and_save(bundle, loader, csv_reg, num_mc_samples=2)
    assert len(open(csv_reg).read().strip().split("\n")) == 5
