"""Frozen-backbone fine-tuning: trunk posterior regions must stay
bit-identical while the fusion head trains."""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.engine.optim import (
    BayesTrainState,
    make_backbone_freeze_mask,
    make_optimizer_with_freeze,
)
from multimodal_auv_tpu.engine.steps import make_train_step
from multimodal_auv_tpu.models.model_utils import ArchConfig, make_multimodal_bundle

SPEC = BNNPriorSpec()
TINY = ArchConfig.micro()
S = 32


def test_freeze_mask_regions():
    bundle = make_multimodal_bundle(3, SPEC, jax.random.PRNGKey(0), TINY)
    mask = make_backbone_freeze_mask(bundle.meta, bundle.post)
    m = np.asarray(mask.mu)
    for e in bundle.meta.entries:
        region = m[e.offset:e.offset + e.size]
        if e.path[0].startswith(("attention_", "fc")):
            assert (region == 1.0).all(), e.path
        else:
            assert (region == 0.0).all(), e.path
    # pad region frozen
    assert (m[bundle.meta.n_real:] == 0.0).all()


def test_frozen_backbone_training_only_updates_head():
    bundle = make_multimodal_bundle(3, SPEC, jax.random.PRNGKey(0), TINY)
    mask = make_backbone_freeze_mask(bundle.meta, bundle.post)
    tx = make_optimizer_with_freeze(1e-3, 1e-5, mask)
    state = BayesTrainState(post=bundle.post, opt_state=tx.init(bundle.post),
                            batch_stats=bundle.batch_stats,
                            step=jnp.zeros((), jnp.int32))
    step = make_train_step(bundle.module, bundle.meta, SPEC, tx, num_mc=2,
                           impl="jnp", update_batch_stats=False)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, S, S, 3))
    s = jax.random.uniform(jax.random.PRNGKey(2), (4, S, S, 1))
    labels = jnp.array([0, 1, 2, 0], jnp.int32)
    mu0 = np.asarray(state.post.mu).copy()

    for i in range(2):
        state, m = step(state, (x, x, s), labels, jnp.ones((4,)),
                        jax.random.PRNGKey(3 + i), 0.1, 4.0)
    mu1 = np.asarray(state.post.mu)

    head = np.zeros(bundle.meta.n_padded, bool)
    for e in bundle.meta.entries:
        if e.path[0].startswith(("attention_", "fc")):
            head[e.offset:e.offset + e.size] = True
    # trunks bit-identical, head moved
    np.testing.assert_array_equal(mu1[~head], mu0[~head])
    assert np.abs(mu1[head] - mu0[head]).max() > 0
    # BN (det) untouched
    d0 = jax.tree_util.tree_leaves(bundle.post.det)
    d1 = jax.tree_util.tree_leaves(state.post.det)
    for a, b in zip(d0, d1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
