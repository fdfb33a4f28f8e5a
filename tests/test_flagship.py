"""Flagship-geometry sharded validation (round-3 verdict, next-round #5).

Every other mesh test runs ArchConfig.micro()/tiny() — topology-agnostic for
sharding *semantics*, but blind to real-size layout bugs: FSDP divisibility
of the true packed posterior length, BN channel counts of the real widths
(64..2048), and weight-side collective shapes at the production parameter
count. These tests build the FULL ResNet-50 x3 multimodal bundle — the same
stage_sizes/width/dtype as the shipped flagship (SURVEY.md §3.5: the
~75M-parameter posterior of /root/reference/src/Multimodal_AUV/models/
base_models.py:54-90 under dnn_to_bnn) — and run one FSDP train step plus
one mc-sharded predict on the 8-virtual-device mesh.

Image size is 64 (not the production 256): the packed length, BN channel
layouts, FSDP partition, and every weight-side collective shape are set by
stage_sizes/width alone and are identical at any image size, while
activation FLOPs scale with image area — 64 keeps the single-core CPU
runtime in minutes. Activation dtype stays the production bfloat16.

Slow-marked: the full-geometry compile dominates (one-time per .jax_cache).
Run with ``pytest --runslow`` (see conftest.py).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_auv_tpu.config import BNNPriorSpec, MeshSpec
from multimodal_auv_tpu.engine.optim import BayesTrainState, make_optimizer
from multimodal_auv_tpu.engine.predict import make_predict_step
from multimodal_auv_tpu.engine.steps import make_train_step
from multimodal_auv_tpu.models.model_utils import ArchConfig, make_multimodal_bundle
from multimodal_auv_tpu.parallel import mesh as M

pytestmark = pytest.mark.slow

SPEC = BNNPriorSpec()



@pytest.fixture(scope="module")
def flagship_bundle():
    arch = ArchConfig(image_size=64)  # full (3,4,6,3) x width-64 ResNet-50 x3
    assert tuple(arch.stage_sizes) == (3, 4, 6, 3) and arch.width == 64, (
        "flagship test must use the production topology")
    return make_multimodal_bundle(7, SPEC, jax.random.PRNGKey(0), arch)


@pytest.fixture(scope="module")
def flagship_mesh():
    return M.make_mesh(MeshSpec(data=4, mc=2, fsdp=True))


def test_flagship_packed_length_and_layouts(flagship_bundle, flagship_mesh):
    """The REAL packed posterior must FSDP-shard over all 8 devices: its
    padded length divisible by the mesh size, BN stats replicated, and the
    Adam moments of the packed arrays sharded identically."""
    bundle = flagship_bundle
    n = int(bundle.post.mu.shape[0])
    # the real flagship posterior: 3 bayesianized ResNet-50 trunks + fusion
    # head (~73M parameters), padded to pad_multiple=1024
    assert n > 70_000_000, f"packed length {n} is not flagship-sized"
    assert n % 1024 == 0, "pad_multiple guarantee violated"
    assert n % 8 == 0, "packed length must divide the 8-device mesh"

    mesh = flagship_mesh
    tx = make_optimizer(1e-3)
    state = BayesTrainState(post=bundle.post, opt_state=tx.init(bundle.post),
                            batch_stats=bundle.batch_stats,
                            step=jnp.zeros((), jnp.int32))
    st = M.shard_state(mesh, state, fsdp=True)
    want = M.posterior_sharding(mesh, fsdp=True)
    assert st.post.mu.sharding == want and st.post.rho.sharding == want
    # each device holds exactly 1/8 of the packed axis
    shard_rows = {s.data.shape[0] for s in st.post.mu.addressable_shards}
    assert shard_rows == {n // 8}
    # Adam moments of the packed arrays sharded like the posterior
    packed_moments = [l for l in jax.tree_util.tree_leaves(st.opt_state)
                      if hasattr(l, "ndim") and l.ndim == 1
                      and l.shape == st.post.mu.shape]
    assert packed_moments
    assert all(m.sharding == want for m in packed_moments)
    # real-width BN stats (channels 64..2048, not multiples of 8 in every
    # layer) must be REPLICATED — a wrong layout here raises in device_put
    bn = jax.tree_util.tree_leaves(st.batch_stats)
    assert bn and all(a.sharding.is_fully_replicated for a in bn)


def test_flagship_fsdp_train_step_and_mc_predict():
    """One production-geometry FSDP train step (DP over 'data', packed
    posterior + Adam over both axes, MC draws over 'mc') and one mc-sharded
    predict: finite outputs, posterior actually updated, shardings preserved
    across the step (no silent re-layout/gather inserted by SPMD).

    Runs in a SUBPROCESS (tests/flagship_exec_worker.py): XLA:CPU's
    collective rendezvous carries a hardcoded 40 s termination timeout that
    SIGABRTs the whole process when the 8 virtual devices timeshare too few
    real cores (observed repeatedly at flagship geometry on a 1-vCPU
    runner; the timeout is not configurable in this jaxlib). Isolation +
    one retry keeps an infra abort (rc=-6/134) from killing the suite and
    keeps it distinguishable from a REAL assertion failure (rc=1), which
    still fails hard. Two consecutive infra aborts xfail with the
    documented reason rather than masking as green.
    """
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "flagship_exec_worker.py")
    env = dict(os.environ, AUV_CACHE=os.path.join(repo, ".jax_cache"))
    last = None
    for attempt in range(2):
        proc = subprocess.run([sys.executable, worker], env=env,
                              capture_output=True, text=True, timeout=2700)
        last = proc
        if proc.returncode == 0:
            assert "FLAGSHIP_EXEC_OK" in proc.stdout
            return
        if proc.returncode not in (-6, 134):  # not an XLA rendezvous abort
            raise AssertionError(
                f"flagship exec worker failed (rc={proc.returncode}):\n"
                f"{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}")
    assert last is not None
    pytest.xfail(
        "XLA:CPU collective-rendezvous termination timeout (hardcoded 40 s) "
        "aborted the flagship execution twice — the 8 virtual devices "
        "cannot all be scheduled in time on this host's core count; "
        "infra limitation, not a model/sharding failure "
        f"(worker stderr tail: {last.stderr[-500:]!r})")
