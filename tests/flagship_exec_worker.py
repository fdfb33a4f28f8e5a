"""Subprocess worker for the flagship-geometry sharded EXECUTION check.

Run by tests/test_flagship.py::test_flagship_fsdp_train_step_and_mc_predict
in its own process because XLA:CPU's collective rendezvous has a HARDCODED
40 s termination timeout (rendezvous.cc: "Termination timeout ... of 40
seconds exceeded. Exiting to ensure a consistent program state") that
F-checks — i.e. SIGABRTs — the entire process when the 8 virtual devices
timeshare too few real cores to get every participant scheduled in time
(observed repeatedly on this 1-vCPU runner at flagship geometry; the
relevant DebugOptions are neither registered XLA_FLAGS in this jaxlib nor
honored via compiler_options). In-process, one unlucky scheduling stall
killed the whole suite; isolated here, the parent retries once and can
tell an infra abort (rc=134) from a real assertion failure (rc=1).

All model/sharding assertions from the original in-process test body are
preserved verbatim; prints FLAGSHIP_EXEC_OK as the success sentinel.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("AUV_CACHE", os.path.join(
                      os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache")))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from multimodal_auv_tpu.config import BNNPriorSpec, MeshSpec  # noqa: E402
from multimodal_auv_tpu.engine.optim import (  # noqa: E402
    BayesTrainState,
    make_optimizer,
)
from multimodal_auv_tpu.engine.predict import make_predict_step  # noqa: E402
from multimodal_auv_tpu.engine.steps import make_train_step  # noqa: E402
from multimodal_auv_tpu.models.model_utils import (  # noqa: E402
    ArchConfig,
    make_multimodal_bundle,
)
from multimodal_auv_tpu.parallel import mesh as M  # noqa: E402


def main() -> None:
    SPEC = BNNPriorSpec()
    arch = ArchConfig(image_size=64)  # full (3,4,6,3) x width-64 topology
    assert tuple(arch.stage_sizes) == (3, 4, 6, 3) and arch.width == 64
    bundle = make_multimodal_bundle(7, SPEC, jax.random.PRNGKey(0), arch)
    mesh = M.make_mesh(MeshSpec(data=4, mc=2, fsdp=True))

    tx = make_optimizer(1e-3)
    state = BayesTrainState(post=bundle.post, opt_state=tx.init(bundle.post),
                            batch_stats=bundle.batch_stats,
                            step=jnp.zeros((), jnp.int32))
    step = make_train_step(bundle.module, bundle.meta, SPEC, tx, num_mc=2,
                           mc_chunk=2, impl="jnp",
                           ws_sharding=M.mc_sharding(mesh), donate=False)
    rng = np.random.default_rng(0)
    batch, s = 8, 64
    inputs = tuple(jnp.asarray(rng.normal(size=(batch, s, s, c)), jnp.float32)
                   for c in (3, 3, 1))
    labels = jnp.asarray((np.arange(batch) % 7).astype(np.int32))
    with jax.set_mesh(mesh):
        st = M.shard_state(mesh, state, fsdp=True)
        sharded_in = tuple(M.shard_batch(mesh, x) for x in inputs)
        new_state, metrics = step(st, sharded_in,
                                  M.shard_batch(mesh, labels),
                                  M.shard_batch(mesh, jnp.ones((batch,))),
                                  jax.random.PRNGKey(1), 0.5, float(batch))
        jax.block_until_ready(new_state.post.mu)

    assert np.isfinite(float(metrics["loss"]))
    assert float(jnp.abs(new_state.post.mu - st.post.mu).max()) > 0
    # the step must return the state in the SAME layout it consumed
    assert new_state.post.mu.sharding == st.post.mu.sharding
    assert new_state.post.rho.sharding == st.post.rho.sharding
    bn_new = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert all(a.sharding.is_fully_replicated for a in bn_new)

    # mc-sharded predict at the production parameter count (draws spread
    # over 'mc', batch over 'data', posterior FSDP — the all-gather of the
    # real 73M packed axis is exercised here)
    pred = make_predict_step(bundle, 2, mc_chunk=2, impl="jnp",
                             ws_sharding=M.mc_sharding(mesh))
    with jax.set_mesh(mesh):
        out = pred(new_state.post, new_state.batch_stats, sharded_in,
                   jax.random.PRNGKey(2))
        out = jax.tree_util.tree_map(np.asarray, out)
    assert out["predicted"].shape == (batch,)
    assert out["mean_prob"].shape == (batch, 7)
    assert np.isfinite(out["mean_prob"]).all()
    assert np.all(out["predictive_uncertainty"] >= 0)
    assert np.all(out["aleatoric_uncertainty"] >= 0)
    np.testing.assert_allclose(out["mean_prob"].sum(-1), 1.0, atol=1e-2)
    print("FLAGSHIP_EXEC_OK", flush=True)


if __name__ == "__main__":
    main()
