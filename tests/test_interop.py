"""Torch checkpoint import tests: key mapping, transposes, head swap — and a
numerical cross-check of conv/dense semantics against torch itself."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.interop.torch_import import (
    import_posterior,
    torch_key_to_flax,
)
from multimodal_auv_tpu.models.model_utils import ArchConfig, make_multimodal_bundle

TINY = ArchConfig.tiny()


def test_key_mapping():
    f = torch_key_to_flax
    assert f("image_model_feat.conv1.mu_kernel") == (
        ("image_model_feat", "conv1"), "kernel", "mu")
    assert f("image_model_feat.layer1.0.conv2.rho_kernel") == (
        ("image_model_feat", "layer1_0", "conv2"), "kernel", "rho")
    assert f("image_model_feat.layer2.1.downsample.0.mu_kernel") == (
        ("image_model_feat", "layer2_1", "downsample_conv"), "kernel", "mu")
    assert f("image_model_feat.layer2.1.downsample.1.weight") == (
        ("image_model_feat", "layer2_1", "downsample_bn"), "weight", "det")
    assert f("fc.mu_weight") == (("fc",), "kernel", "mu")
    assert f("attention_image.query_projection.mu_bias") == (
        ("attention_image", "query_projection"), "bias", "mu")
    assert f("bn1.running_mean") == (("bn1",), "mean", "bn_mean")
    assert f("bn1.num_batches_tracked") is None
    assert f("model.fc.rho_bias") == (("model", "fc"), "bias", "rho")


def _tiny_state_dict(bundle, num_classes=7, prefix_module=True):
    """Synthesise a bayesian-torch-style state dict shaped for our tiny
    multimodal model, with recognisable values."""
    sd = {}
    rng = np.random.default_rng(0)
    for e in bundle.meta.entries:
        # flax path -> torch key
        parts = list(e.path[:-1])
        leaf = e.path[-1]
        tparts = []
        for p in parts:
            if p.startswith("layer") and "_" in p:
                stage, blk = p[5:].split("_")
                tparts.append(f"layer{stage}.{blk}")
            elif p == "downsample_conv":
                tparts.append("downsample.0")
            elif p == "downsample_bn":
                tparts.append("downsample.1")
            else:
                tparts.append(p)
        base = ".".join(tparts)
        shape = e.shape
        if leaf == "kernel" and len(shape) == 4:
            arr = rng.normal(size=(shape[3], shape[2], shape[0], shape[1]))
            sd[f"{base}.mu_kernel"] = torch.tensor(arr, dtype=torch.float32)
            sd[f"{base}.rho_kernel"] = torch.full(
                (shape[3], shape[2], shape[0], shape[1]), -5.0)
        elif leaf == "kernel":
            arr = rng.normal(size=(shape[1], shape[0]))
            sd[f"{base}.mu_weight"] = torch.tensor(arr, dtype=torch.float32)
            sd[f"{base}.rho_weight"] = torch.full((shape[1], shape[0]), -5.0)
        else:
            sd[f"{base}.mu_bias"] = torch.zeros(shape)
            sd[f"{base}.rho_bias"] = torch.full(shape, -5.0)
    if prefix_module:
        sd = {f"module.{k}": v for k, v in sd.items()}
    return sd


def test_import_posterior_full_roundtrip(tmp_path):
    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    TINY)
    sd = _tiny_state_dict(bundle)
    path = str(tmp_path / "pytorch_model.bin")
    torch.save(sd, path)

    from multimodal_auv_tpu.interop.torch_import import load_torch_state_dict

    loaded = load_torch_state_dict(path)
    assert not any(k.startswith("module.") for k in loaded)

    post, bs, stats = import_posterior(bundle, loaded, num_classes=7)
    assert stats["dropped"] == 0
    # every variational leaf loaded (mu + rho per entry)
    assert stats["loaded"] == 2 * len(bundle.meta.entries)
    # all rho values are -5 within the real region
    rho = np.asarray(post.rho[: bundle.meta.n_real])
    np.testing.assert_allclose(rho, -5.0)

    # conv transpose correctness: torch OIHW -> flax HWIO
    e = next(en for en in bundle.meta.entries
             if en.path == ("image_model_feat", "conv1", "kernel"))
    tw = sd["module.image_model_feat.conv1.mu_kernel"].numpy()
    flax_w = np.asarray(post.mu[e.offset:e.offset + e.size]).reshape(e.shape)
    np.testing.assert_allclose(flax_w, np.transpose(tw, (2, 3, 1, 0)),
                               rtol=1e-6)


def test_import_drops_head_on_class_mismatch(tmp_path):
    bundle7 = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                     TINY)
    sd = _tiny_state_dict(bundle7)
    bundle4 = make_multimodal_bundle(4, BNNPriorSpec(), jax.random.PRNGKey(1),
                                     TINY)
    loaded = {k[len("module."):]: v.numpy() for k, v in sd.items()}
    post, bs, stats = import_posterior(bundle4, loaded, num_classes=4)
    assert stats["dropped"] >= 4  # fc2 mu/rho kernel+bias dropped
    # fc2 retains its fresh random init
    e = next(en for en in bundle4.meta.entries if en.path == ("fc2", "kernel"))
    np.testing.assert_allclose(
        np.asarray(post.mu[e.offset:e.offset + e.size]),
        np.asarray(bundle4.post.mu[e.offset:e.offset + e.size]))


def test_conv_semantics_match_torch():
    """flax Conv(NHWC, HWIO) with padding 3/stride 2 == torch Conv2d(7x7,
    stride 2, padding 3) after layout transposes — validates the importer's
    transpose convention end-to-end numerically."""
    rng = np.random.default_rng(0)
    w_oihw = rng.normal(size=(8, 3, 7, 7)).astype(np.float32)
    x_nchw = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)

    ty = torch.nn.functional.conv2d(torch.tensor(x_nchw),
                                    torch.tensor(w_oihw), stride=2, padding=3)

    from flax import linen as nn

    conv = nn.Conv(8, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                   use_bias=False)
    params = {"params": {"kernel": jnp.asarray(
        np.transpose(w_oihw, (2, 3, 1, 0)))}}
    jy = conv.apply(params, jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(jy), (0, 3, 1, 2)),
                               ty.numpy(), rtol=2e-4, atol=2e-4)


def test_dense_semantics_match_torch():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(5, 9)).astype(np.float32)  # torch (out, in)
    b = rng.normal(size=(5,)).astype(np.float32)
    x = rng.normal(size=(3, 9)).astype(np.float32)
    ty = torch.nn.functional.linear(torch.tensor(x), torch.tensor(w),
                                    torch.tensor(b)).numpy()
    from flax import linen as nn

    dense = nn.Dense(5)
    jy = dense.apply({"params": {"kernel": jnp.asarray(w.T),
                                 "bias": jnp.asarray(b)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jy), ty, rtol=1e-5, atol=1e-5)
