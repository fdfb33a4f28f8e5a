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


# ---------------------------------------------------------------------------
# Whole-model golden: torch twin forward vs imported flax model
# (reference semantics: predictors.py:52-95, Example_Inference_model.py:78-112)
# ---------------------------------------------------------------------------

def _flax_path_to_torch_key(path):
    """Inverse of torch_key_to_flax for the twin's deterministic names."""
    segs = []
    for p in path[:-1]:
        if p.startswith("layer") and "_" in p:
            stage, blk = p[5:].split("_")
            segs.append(f"layer{stage}.{blk}")
        elif p == "downsample_conv":
            segs.append("downsample.0")
        elif p == "downsample_bn":
            segs.append("downsample.1")
        else:
            segs.append(p)
    leaf = {"kernel": "weight", "bias": "bias"}[path[-1]]
    return ".".join(segs + [leaf])


def _to_flax_layout(a):
    if a.ndim == 4:
        return np.transpose(a, (2, 3, 1, 0))
    if a.ndim == 2:
        return np.transpose(a, (1, 0))
    return a


def test_full_model_torch_parity():
    """End-to-end numerical parity with the reference stack: a torch twin of
    the multimodal BNN (same geometry, bayesian-torch-style state dict) and
    the flax model under imported weights must produce (1) identical
    deterministic logits at the posterior mean and (2) identical per-draw
    logits and uncertainty estimators under matched eps draws — the
    whole-model analogue of predictors.py:52-95."""
    import torch

    from multimodal_auv_tpu.engine import uncertainty as U
    from tests.torch_twin import (
        TorchMultiModal,
        bayesianize_state_dict,
        set_draw,
    )

    torch.manual_seed(0)
    twin = TorchMultiModal(num_classes=7, width=TINY.width,
                           stage_sizes=tuple(TINY.stage_sizes))
    sd, sigmas = bayesianize_state_dict(twin, delta=0.05)
    mus = {k: p.detach().cpu().numpy().copy()
           for k, p in twin.named_parameters()}

    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    TINY)
    from multimodal_auv_tpu.interop.torch_import import import_posterior as ip
    post, bs, stats = ip(bundle, sd)
    assert stats["dropped"] == 0, f"geometry mismatch: {stats}"
    bundle.post, bundle.batch_stats = post, bs

    rng = np.random.default_rng(7)
    s = TINY.image_size
    a = rng.uniform(size=(2, s, s, 3)).astype(np.float32)
    b = rng.uniform(size=(2, s, s, 3)).astype(np.float32)
    c = rng.uniform(size=(2, s, s, 1)).astype(np.float32)
    t_in = [torch.from_numpy(np.transpose(x, (0, 3, 1, 2))) for x in (a, b, c)]
    f_in = tuple(jnp.asarray(x) for x in (a, b, c))

    twin.train()  # reference runs BN in train mode even at inference
    with torch.no_grad():
        det_t = twin(*t_in).numpy()
    det_f, _ = bundle.apply_with_weights(bundle.post.mu, *f_in, train=True,
                                         mutable=True)
    np.testing.assert_allclose(np.asarray(det_f), det_t, rtol=2e-3, atol=2e-4)

    # matched-eps MC draws
    mu_packed = np.asarray(bundle.post.mu).copy()
    rho_packed = np.asarray(bundle.post.rho)
    sigma_packed = np.logaddexp(rho_packed, 0.0)  # softplus
    logits_t, logits_f = [], []
    for k in range(4):
        eps_by_key = {key: rng.normal(size=v.shape).astype(np.float32)
                      for key, v in sigmas.items()}
        set_draw(twin, mus, sigmas, eps_by_key)
        with torch.no_grad():
            logits_t.append(twin(*t_in).numpy())

        eps_packed = np.zeros_like(mu_packed)
        for e in bundle.meta.entries:
            tk = _flax_path_to_torch_key(e.path)
            if tk in eps_by_key:
                eps_packed[e.offset:e.offset + e.size] = np.ravel(
                    _to_flax_layout(eps_by_key[tk]))
        w = (mu_packed + sigma_packed * eps_packed).astype(np.float32)
        out_f, _ = bundle.apply_with_weights(jnp.asarray(w), *f_in,
                                             train=True, mutable=True)
        logits_f.append(np.asarray(out_f))
        np.testing.assert_allclose(logits_f[-1], logits_t[-1],
                                   rtol=2e-3, atol=3e-4)

    lt = jnp.asarray(np.stack(logits_t))
    lf = jnp.asarray(np.stack(logits_f))
    # both uncertainty families, computed by our estimators on both stacks
    for fam in (U.variance_uncertainty,
                lambda p: U.aleatoric_uncertainty(p, eps=1e-7)):
        ut = np.asarray(fam(U.softmax_probs(lt)))
        uf = np.asarray(fam(U.softmax_probs(lf)))
        np.testing.assert_allclose(uf, ut, rtol=5e-3, atol=1e-6)
    # reference variance estimator re-derived in numpy (predictors.py:67-76):
    # mean over classes of the per-class variance across draws (ddof=1)
    probs_t = np.asarray(U.softmax_probs(lt))
    ref_var = probs_t.var(axis=0, ddof=1).mean(axis=-1)
    np.testing.assert_allclose(
        np.asarray(U.variance_uncertainty(U.softmax_probs(lf))),
        ref_var, rtol=5e-3, atol=1e-7)


def test_torchvision_named_pretrained_trunk_init(tmp_path):
    """The production fine-tuning path: a torchvision-*named* ResNet-50
    state dict (conv1.weight, layer1.0.conv1.weight, fc.weight, ...) must
    MOPED-initialise the trunks of define_models/load_models — the offline
    equivalent of the reference's IMAGENET1K_V1 init
    (models/model_utils.py:26-64)."""
    import torch

    from multimodal_auv_tpu.bayes import softplus_inv
    from multimodal_auv_tpu.models.model_utils import define_models, load_models
    from tests.torch_twin import TorchResNetTrunk

    torch.manual_seed(1)
    trunk = TorchResNetTrunk(3, width=TINY.width,
                             stage_sizes=tuple(TINY.stage_sizes))
    sd = {k: v for k, v in trunk.state_dict().items()}
    feat = trunk.feature_size
    sd["fc.weight"] = torch.randn(1000, feat)  # torchvision classifier head
    sd["fc.bias"] = torch.randn(1000)
    path = str(tmp_path / "resnet50_imagenet.pth")
    torch.save(sd, path)

    spec = BNNPriorSpec()
    models = define_models(7, spec, jax.random.PRNGKey(0), TINY,
                           pretrained_paths={"image": path, "channels": path,
                                             "sss": path})

    conv1_t = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)

    # multimodal trunks: image (3-ch) loads conv1; sss (1-ch) drops it
    mm = models["multimodal_model"]
    entries = {e.path: e for e in mm.meta.entries}
    mu = np.asarray(mm.post.mu)
    rho = np.asarray(mm.post.rho)
    e_img = entries[("image_model_feat", "conv1", "kernel")]
    got = mu[e_img.offset:e_img.offset + e_img.size].reshape(e_img.shape)
    np.testing.assert_allclose(got, conv1_t, rtol=1e-6)
    # MOPED sigma = delta * |mu|
    sig = np.asarray(jax.nn.softplus(
        rho[e_img.offset:e_img.offset + e_img.size])).reshape(e_img.shape)
    np.testing.assert_allclose(sig, np.maximum(
        spec.moped_delta * np.abs(conv1_t), 1e-12), rtol=1e-5)
    e_sss = entries[("sss_model_feat", "conv1", "kernel")]
    got_sss = mu[e_sss.offset:e_sss.offset + e_sss.size].reshape(e_sss.shape)
    assert got_sss.shape[2] == 1 and not np.allclose(
        got_sss, conv1_t[:, :, :1, :])  # channel mismatch -> kept random

    # unimodal classifier trunk (prefix "model"), BN stats included
    um = models["image_model"]
    ue = {e.path: e for e in um.meta.entries}[("model", "conv1", "kernel")]
    np.testing.assert_allclose(
        np.asarray(um.post.mu)[ue.offset:ue.offset + ue.size].reshape(ue.shape),
        conv1_t, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(um.batch_stats["model"]["bn1"]["mean"]),
        sd["bn1.running_mean"].numpy(), rtol=1e-6)

    # deterministic feature trunk dict
    fv = models["image_model_feat"]["variables"]
    np.testing.assert_allclose(np.asarray(fv["params"]["conv1"]["kernel"]),
                               conv1_t, rtol=1e-6)

    # load_models path ("image" slot) with the same file
    (img, _, _) = load_models({"image": path}, arch=TINY)
    np.testing.assert_allclose(
        np.asarray(img["variables"]["params"]["conv1"]["kernel"]),
        conv1_t, rtol=1e-6)


def test_export_import_roundtrip(tmp_path):
    """export_posterior is the exact inverse of import_posterior: a bundle
    exported to a bayesian-torch-named state dict and re-imported into a
    FRESH bundle reproduces (mu, rho, det, batch_stats) — the hand-back
    path for weights trained here (reference loaders consume the same
    naming, Example_Inference_model.py:82-112)."""
    from multimodal_auv_tpu.interop.torch_export import (
        export_posterior,
        save_torch_checkpoint,
    )
    from multimodal_auv_tpu.interop.torch_import import load_torch_state_dict

    src = make_multimodal_bundle(5, BNNPriorSpec(), jax.random.PRNGKey(3),
                                 TINY)
    # make the posterior non-trivial so equality is meaningful
    src.post = src.post.replace(
        mu=src.post.mu + 0.01 * jnp.arange(src.post.mu.shape[0],
                                           dtype=jnp.float32) % 7,
        rho=src.post.rho - 0.5)

    path = str(tmp_path / "export.pth")
    stats = save_torch_checkpoint(src, path)
    assert stats["exported"] > 100

    dst = make_multimodal_bundle(5, BNNPriorSpec(), jax.random.PRNGKey(9),
                                 TINY)
    sd = load_torch_state_dict(path)
    post, bs, istats = import_posterior(dst, sd)
    assert istats["dropped"] == 0, istats

    np.testing.assert_allclose(np.asarray(post.mu[:src.meta.n_real]),
                               np.asarray(src.post.mu[:src.meta.n_real]),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(post.rho[:src.meta.n_real]),
                               np.asarray(src.post.rho[:src.meta.n_real]),
                               atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(post.det),
                    jax.tree_util.tree_leaves(src.post.det)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(bs),
                    jax.tree_util.tree_leaves(src.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_export_matches_torch_twin_naming():
    """Exported keys for a twin-imported bundle must name the same tensors
    (and values) as the torch twin's bayesianized state dict — i.e. the
    export really is the reference's on-disk format."""
    from tests.torch_twin import TorchMultiModal, bayesianize_state_dict
    from multimodal_auv_tpu.interop.torch_export import export_posterior

    torch.manual_seed(1)
    twin = TorchMultiModal(num_classes=7, width=TINY.width,
                           stage_sizes=tuple(TINY.stage_sizes))
    sd, _ = bayesianize_state_dict(twin, delta=0.05)

    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    TINY)
    post, bs, stats = import_posterior(bundle, sd)
    assert stats["dropped"] == 0
    bundle.post, bundle.batch_stats = post, bs

    out = export_posterior(bundle)
    sd_np = {k: np.asarray(v) for k, v in sd.items()}
    missing = [k for k in sd_np
               if k not in out and "num_batches_tracked" not in k
               and not k.startswith("prior_")]
    assert not missing, f"export misses reference keys: {missing[:5]}"
    for k, v in sd_np.items():
        if k in out and out[k].shape == v.shape and out[k].ndim > 0:
            np.testing.assert_allclose(out[k], v, atol=1e-6,
                                       err_msg=f"mismatch at {k}")


def test_export_for_hub_layout(tmp_path):
    """export_for_hub writes the exact path the reference downloads:
    <repo>/multimodal-bnn/pytorch_model.bin (functions.py:60-63), loadable
    through the normal fetch -> load path."""
    from multimodal_auv_tpu.interop.hub import (
        export_for_hub,
        fetch_pretrained_weights,
    )
    from multimodal_auv_tpu.interop.torch_import import load_torch_state_dict

    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(5),
                                    TINY)
    path = export_for_hub(bundle, str(tmp_path))
    assert path.endswith("multimodal-bnn/pytorch_model.bin")
    assert fetch_pretrained_weights(local_path=path) == path
    sd = load_torch_state_dict(path)
    assert any(k.endswith("mu_kernel") for k in sd)


@pytest.mark.slow
def test_retrain_from_exported_checkpoint(tmp_path, monkeypatch):
    """Full hand-off journey: train/export here -> retrain pipeline consumes
    the exported .pth as its pretrained weights, swapping the fc2 head for a
    different class count (the foundation-model mechanism,
    Example_Retraining_model.py:72-84)."""
    import os

    from tests.fixtures.make_tree import make_training_tree
    from multimodal_auv_tpu.interop.torch_export import save_torch_checkpoint
    from multimodal_auv_tpu.models.model_utils import ArchConfig
    from multimodal_auv_tpu.pipelines.training import run_auv_retraining

    micro = ArchConfig.micro(image_size=64)
    src = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(1),
                                 micro)
    ckpt = str(tmp_path / "foundation.pth")
    save_torch_checkpoint(src, ckpt)

    monkeypatch.chdir(tmp_path)
    root = make_training_tree(str(tmp_path / "data"), n_samples=6,
                              labels=("Sand", "Mud", "Rock"))
    ok = run_auv_retraining(
        root_dir=root, num_classes=3, epochs_multimodal=1, num_mc=2,
        batch_size_multimodal=3, model_weights_path=ckpt, arch=micro)
    assert ok is True
    assert os.path.exists(os.path.join(root, "csvs",
                                       "multimodal_train_results.csv"))


def test_adam_and_steplr_match_torch():
    """make_optimizer claims torch.optim.Adam semantics (coupled L2, betas
    0.9/0.999, eps 1e-8) and StepLR claims the torch scheduler — verify
    both against torch numerically over a multi-step trajectory."""
    import optax

    from multimodal_auv_tpu.engine.optim import StepLR, make_optimizer

    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(13,)).astype(np.float32)
    grads = [rng.normal(size=(13,)).astype(np.float32) for _ in range(6)]
    lr, wd = 1e-3, 1e-2

    # torch trajectory
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
    t_traj = []
    for g in grads:
        topt.zero_grad(set_to_none=True)
        tp.grad = torch.from_numpy(g.copy())
        topt.step()
        t_traj.append(tp.detach().numpy().copy())

    # ours
    tx = make_optimizer(lr, wd)
    params = jnp.asarray(p0)
    state = tx.init(params)
    for g, expect in zip(grads, t_traj):
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params), expect,
                                   rtol=1e-5, atol=1e-7)

    # StepLR: lr after each epoch must match torch's scheduler, including
    # the get_last_lr semantics across the step boundary
    sched = StepLR(lr, step_size=3, gamma=0.5)
    tp2 = torch.nn.Parameter(torch.zeros(1))
    topt2 = torch.optim.Adam([tp2], lr=lr)
    tsched = torch.optim.lr_scheduler.StepLR(topt2, step_size=3, gamma=0.5)
    for _ in range(8):
        assert sched.lr == pytest.approx(tsched.get_last_lr()[0])
        topt2.step()
        tsched.step()
        sched.step()


# ---------------------------------------------------------------------------
# HF checkpoint key inventory + import coverage audit (interop/hf_manifest.py)
# — the offline evidence for real-weights import correctness: the inventory
# of keys the published artifact must contain, derived from the reference's
# construction (model_utils.py:10-49 + dnn_to_bnn naming,
# Example_Inference_model.py:82-112), cross-validated against the torch twin.


def test_expected_keys_match_torch_twin():
    """The generated inventory must name exactly the keys the reference's
    construction produces — cross-validated against the bayesianized torch
    twin's actual state_dict() (post-remap / published=False form): zero
    missing, zero unexpected, zero shape mismatches."""
    from multimodal_auv_tpu.interop.hf_manifest import (
        audit_coverage,
        expected_checkpoint_keys,
    )
    from tests.torch_twin import TorchMultiModal, bayesianize_state_dict

    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    TINY)
    torch.manual_seed(0)
    twin = TorchMultiModal(num_classes=7, width=TINY.width,
                           stage_sizes=tuple(TINY.stage_sizes))
    sd, _ = bayesianize_state_dict(twin)

    expected = expected_checkpoint_keys(bundle, published=False)
    assert set(expected) == set(sd)
    audit = audit_coverage(sd, expected)
    assert audit["missing"] == []
    assert audit["unexpected"] == []
    assert audit["shape_mismatch"] == []
    # role census is self-consistent: every mu has a rho, every BN affine
    # pair has a statistics pair
    assert audit["by_role"]["mu"] == audit["by_role"]["rho"]
    assert audit["by_role"]["bn_affine"] == audit["by_role"]["bn_stats"]


def test_expected_keys_published_form():
    """published=True is the artifact form: trunks nested under `.model.`
    (Example_Inference_model.py:88-93) plus bayesian-torch eps/prior
    buffers; conv shapes are OIHW as torch stores them."""
    from multimodal_auv_tpu.interop.hf_manifest import expected_checkpoint_keys

    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    TINY)
    pub = expected_checkpoint_keys(bundle, published=True)
    assert "image_model_feat.model.conv1.mu_kernel" in pub
    assert "image_model_feat.model.conv1.eps_kernel" in pub
    assert pub["image_model_feat.model.conv1.eps_kernel"]["role"] == "ignored"
    assert "image_model_feat.model.bn1.running_mean" in pub
    # the fusion head is NOT trunk-nested
    assert "fc2.mu_weight" in pub and "fc2.prior_weight_mu" in pub
    assert "attention_image.query_projection.mu_weight" in pub
    # torch stores convs OIHW; the inventory records the file's shapes
    e = next(en for en in bundle.meta.entries
             if en.path == ("image_model_feat", "conv1", "kernel"))
    h, w, i, o = e.shape
    assert pub["image_model_feat.model.conv1.mu_kernel"]["shape"] == \
        [o, i, h, w]
    # published form strictly extends the loadable key set with buffers
    nopub = expected_checkpoint_keys(bundle, published=False)
    loadable = {k for k, v in pub.items() if v["role"] != "ignored"}
    assert {k for k in loadable if not k.startswith(
        tuple(f"{t}.model." for t in ("image_model_feat", "bathy_model_feat",
                                      "sss_model_feat")))} <= set(nopub)


def test_import_posterior_reports_coverage():
    """import_posterior's stats must carry the by-name audit: a dict with
    only variational keys (no BN) reports the BN keys missing and nothing
    unexpected; an alien key is reported unexpected."""
    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    TINY)
    sd = {k[len("module."):]: v.numpy()
          for k, v in _tiny_state_dict(bundle).items()}
    _, _, stats = import_posterior(bundle, sd, num_classes=7)
    assert stats["unexpected"] == []
    assert stats["missing"]  # _tiny_state_dict has no BN keys
    assert not [k for k in stats["missing"] if ".mu_" in k or ".rho_" in k]

    sd["image_model_feat.not_a_layer.mu_kernel"] = sd[
        "image_model_feat.conv1.mu_kernel"]
    _, _, stats = import_posterior(bundle, sd, num_classes=7)
    assert "image_model_feat.not_a_layer.mu_kernel" in stats["unexpected"]


@pytest.mark.slow
def test_shipped_manifest_fresh():
    """The checked-in expected_hf_keys.json must equal a regeneration from
    the flagship geometry — model drift cannot silently stale the shipped
    manifest (~1 min: builds the full ResNet-50x3 bundle)."""
    import json

    from multimodal_auv_tpu.interop.hf_manifest import (
        MANIFEST_PATH,
        build_flagship_manifest,
    )

    with open(MANIFEST_PATH) as f:
        shipped = json.load(f)
    fresh = build_flagship_manifest()
    assert shipped == fresh
