"""Shape and structure tests for the flax models — analogue of
/root/reference/unittests/test_model.py (shapes, feature sizes, and the
Bayesianness audit)."""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_auv_tpu.bayes import iter_variational_paths
from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.models.fusion import AdditiveAttention, MultiModalModel
from multimodal_auv_tpu.models.model_utils import (
    ArchConfig,
    define_models,
    make_multimodal_bundle,
)
from multimodal_auv_tpu.models.resnet import ResNet, ResNet50Custom

TINY = ArchConfig.tiny()


def test_additive_attention_shape():
    m = AdditiveAttention()
    x = jnp.ones((2, 2048))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 128)


def test_additive_attention_is_gate_not_sum():
    """Output must be V*softmax(...) elementwise — rows of the softmax sum
    to 1 along the hidden axis, so sum(out/V) == 1 per row."""
    m = AdditiveAttention(hidden_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    v = x @ params["params"]["value_projection"]["kernel"] + params["params"]["value_projection"]["bias"]
    gate = np.asarray(y) / np.asarray(v)
    np.testing.assert_allclose(gate.sum(axis=1), 1.0, rtol=1e-4)


def test_resnet_feature_and_classifier_shapes():
    feat = ResNet(stage_sizes=(1, 1, 1, 1), width=8, num_classes=None)
    x = jnp.ones((2, 32, 32, 3))
    variables = feat.init(jax.random.PRNGKey(0), x, train=False)
    y = feat.apply(variables, x, train=False)
    assert y.shape == (2, 8 * 8 * 4)  # width*8*expansion

    clf = ResNet50Custom(num_classes=10, stage_sizes=(1, 1, 1, 1), width=8)
    variables = clf.init(jax.random.PRNGKey(0), x, train=False)
    y = clf.apply(variables, x, train=False)
    assert y.shape == (2, 10)


def test_multimodal_forward_shape_and_channels():
    m = MultiModalModel(num_classes=7, stage_sizes=TINY.stage_sizes, width=TINY.width)
    img = jnp.ones((2, 32, 32, 3))
    bathy = jnp.ones((2, 32, 32, 3))
    sss = jnp.ones((2, 32, 32, 1))
    variables = m.init(jax.random.PRNGKey(0), img, bathy, sss, train=False)
    y = m.apply(variables, img, bathy, sss, train=False)
    assert y.shape == (2, 7)
    # exact fusion geometry (base_models.py:60-65)
    p = variables["params"]
    assert p["fc"]["kernel"].shape == (384, 1284)
    assert p["fc1"]["kernel"].shape == (1284, 32)
    assert p["fc2"]["kernel"].shape == (32, 7)


def test_bayesianness_audit():
    """Every Conv/Dense kernel+bias in the multimodal model is variational;
    no BatchNorm leaf is (reference test_model.py:136-168)."""
    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0), TINY)
    m = MultiModalModel(num_classes=7, stage_sizes=TINY.stage_sizes, width=TINY.width)
    img = jnp.ones((1, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), img, img, jnp.ones((1, 32, 32, 1)),
                       train=False)
    params = variables["params"]
    var_paths = {p for p, _ in iter_variational_paths(params)}
    # expected: every 'kernel' leaf, plus every 'bias' with a sibling kernel
    flat = jax.tree_util.tree_leaves_with_path(params)
    all_keys = {tuple(k.key for k in path) for path, _ in flat}
    expected = {k for k in all_keys if k[-1] == "kernel"}
    expected |= {k for k in all_keys
                 if k[-1] == "bias" and k[:-1] + ("kernel",) in all_keys}
    assert var_paths == expected
    assert not any("bn" in "/".join(p) or "BatchNorm" in "/".join(p) for p in var_paths)
    # attention + fusion heads are variational
    assert ("attention_image", "value_projection", "kernel") in var_paths
    assert ("fc2", "kernel") in var_paths and ("fc2", "bias") in var_paths
    # posterior covers every variational scalar
    n = sum(int(np.prod(l.shape)) for p, l in flat if tuple(k.key for k in p) in var_paths)
    assert bundle.meta.n_real == n


def test_define_models_keys():
    models = define_models(5, BNNPriorSpec().to_dict(), jax.random.PRNGKey(0), TINY)
    assert set(models) == {
        "image_model", "bathy_model", "sss_model", "multimodal_model",
        "image_model_feat", "bathy_model_feat", "sss_model_feat",
    }
    out = models["sss_model"].apply_mean(jnp.ones((1, 32, 32, 1)))
    assert out.shape == (1, 5)


def test_fused_trunks_match_module():
    """Grouped-conv trunk fusion (models/fused.py): the fused forward must
    reproduce MultiModalModel.apply exactly (f32, train-mode BN), with and
    without a ragged-tail batch mask, from the standard param tree."""
    from multimodal_auv_tpu.models.fused import fused_module_for

    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(3),
                                    TINY)
    fused = fused_module_for(bundle.module)
    assert fused.dtype == TINY.dtype

    rng = np.random.default_rng(5)
    s = TINY.image_size
    a = jnp.asarray(rng.uniform(size=(4, s, s, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(4, s, s, 3)), jnp.float32)
    c = jnp.asarray(rng.uniform(size=(4, s, s, 1)), jnp.float32)
    variables = {"params": bundle.meta.unpack(bundle.post.mu, bundle.post.det),
                 "batch_stats": bundle.batch_stats}

    for mask in (None, jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32)):
        want, _ = bundle.module.apply(variables, a, b, c, train=True,
                                      batch_mask=mask,
                                      mutable=["batch_stats"])
        got, _ = fused.apply(variables, a, b, c, train=True,
                             batch_mask=mask, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    # and through the full MC predict composition (sampled weights)
    from multimodal_auv_tpu.engine.mc import mc_logits

    key = jax.random.PRNGKey(9)
    want = mc_logits(bundle.module, bundle.meta, bundle.post,
                     bundle.batch_stats, (a, b, c), key, 2, train=True,
                     remat=False)
    got = mc_logits(fused, bundle.meta, bundle.post, bundle.batch_stats,
                    (a, b, c), key, 2, train=True, remat=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
