"""End-to-end learning test: the full MC-ELBO training stack must reach
high accuracy on linearly-separable synthetic data — a convergence check
the reference's suite lacks (it only asserts weights changed)."""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.engine.optim import BayesTrainState, make_optimizer
from multimodal_auv_tpu.engine.steps import make_eval_step, make_train_step
from multimodal_auv_tpu.models.model_utils import ArchConfig, make_unimodal_bundle

S = 16


def _data(n, num_classes=3, seed=0):
    rng = np.random.default_rng(seed)
    labels = (np.arange(n) % num_classes).astype(np.int32)
    imgs = np.zeros((n, S, S, 3), np.float32)
    for i, lab in enumerate(labels):
        base = rng.normal(0, 0.08, size=(S, S, 3)).astype(np.float32)
        # strong class-dependent channel signal
        base[:, :, lab % 3] += 1.0
        imgs[i] = base
    return imgs, labels


def test_unimodal_bnn_learns_synthetic_classes():
    spec = BNNPriorSpec(moped_enable=False)  # random init, rho ~ N(-3, 0.1)
    arch = ArchConfig(stage_sizes=(1, 1), width=8, image_size=S,
                      dtype=jnp.float32)
    bundle = make_unimodal_bundle(3, 3, spec, jax.random.PRNGKey(0), arch)
    tx = make_optimizer(3e-3)
    state = BayesTrainState(post=bundle.post, opt_state=tx.init(bundle.post),
                            batch_stats=bundle.batch_stats,
                            step=jnp.zeros((), jnp.int32))
    step = make_train_step(bundle.module, bundle.meta, spec, tx, num_mc=2,
                           impl="jnp")
    estep = make_eval_step(bundle.module, bundle.meta, spec, num_mc=4,
                           impl="jnp")

    imgs, labels = _data(24)
    key = jax.random.PRNGKey(1)
    mask = jnp.ones((24,))
    kl_weight = 1e-6  # tiny anneal weight early in training (2^(e+1)/2^E)
    for i in range(30):
        key, sub = jax.random.split(key)
        state, m = step(state, (jnp.asarray(imgs),), jnp.asarray(labels),
                        mask, sub, kl_weight, 24.0)
    assert np.isfinite(float(m["loss"]))

    ev = estep(state.post, state.batch_stats, (jnp.asarray(imgs),),
               jnp.asarray(labels), mask, jax.random.PRNGKey(2), 0.0)
    acc = float(ev["correct"]) / float(ev["total"])
    assert acc >= 0.9, f"training failed to learn: accuracy={acc}"
    # epistemic uncertainty should be finite and small on seen data
    assert np.isfinite(np.asarray(ev["epistemic_variance"])).all()
