"""Mesh/sharding tests on 8 virtual CPU devices (conftest forces
xla_force_host_platform_device_count=8) — the SPMD analogue of the
reference's mocked DataParallel tests (test_utils.py:56-73)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_auv_tpu.config import BNNPriorSpec, MeshSpec
from multimodal_auv_tpu.engine.optim import BayesTrainState, make_optimizer
from multimodal_auv_tpu.engine.steps import make_eval_step, make_train_step
from multimodal_auv_tpu.models.model_utils import ArchConfig, make_multimodal_bundle
from multimodal_auv_tpu.parallel import mesh as M

TINY = ArchConfig.micro()  # sharding semantics are topology-agnostic
SPEC = BNNPriorSpec()


def test_make_mesh_shapes():
    mesh = M.make_mesh(MeshSpec(data=4, mc=2))
    assert dict(mesh.shape) == {"data": 4, "mc": 2}
    mesh2 = M.make_mesh()  # all devices on data
    assert dict(mesh2.shape) == {"data": 8, "mc": 1}
    with pytest.raises(ValueError):
        M.make_mesh(MeshSpec(data=16, mc=2))


def test_sharded_train_step_matches_single_device():
    """The same batch + key must produce the same loss whether run
    replicated on 1 device or sharded over an 8-device mesh."""
    bundle = make_multimodal_bundle(3, SPEC, jax.random.PRNGKey(0), TINY)
    tx = make_optimizer(1e-3)
    step = make_train_step(bundle.module, bundle.meta, SPEC, tx, num_mc=2,
                           impl="jnp")
    state = BayesTrainState(post=bundle.post, opt_state=tx.init(bundle.post),
                            batch_stats=bundle.batch_stats,
                            step=jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(8, 32, 32, 1)).astype(np.float32))
    labels = jnp.asarray((np.arange(8) % 3).astype(np.int32))
    mask = jnp.ones((8,))
    key = jax.random.PRNGKey(1)

    _, m_single = step(state, (x, x, s), labels, mask, key, 0.5, 8.0)

    mesh = M.make_mesh(MeshSpec(data=8, mc=1))
    with jax.set_mesh(mesh):
        st = M.shard_state(mesh, state, fsdp=True)
        xs = M.shard_batch(mesh, x)
        ss = M.shard_batch(mesh, s)
        ls = M.shard_batch(mesh, labels)
        ms = M.shard_batch(mesh, mask)
        _, m_sharded = step(st, (xs, xs, ss), ls, ms, key, 0.5, 8.0)

    assert float(m_single["loss"]) == pytest.approx(float(m_sharded["loss"]),
                                                    rel=1e-4)
    assert float(m_single["correct"]) == float(m_sharded["correct"])


def test_posterior_fsdp_sharding_layout():
    bundle = make_multimodal_bundle(3, SPEC, jax.random.PRNGKey(0), TINY)
    mesh = M.make_mesh(MeshSpec(data=4, mc=2))
    tx = make_optimizer(1e-3)
    state = BayesTrainState(post=bundle.post, opt_state=tx.init(bundle.post),
                            batch_stats=bundle.batch_stats,
                            step=jnp.zeros((), jnp.int32))
    st = M.shard_state(mesh, state, fsdp=True)
    # packed arrays sharded over all 8 devices
    assert len(st.post.mu.sharding.device_set) == 8
    assert len(st.post.rho.sharding.device_set) == 8
    # Adam moments of packed arrays sharded identically
    adam_mu = jax.tree_util.tree_leaves(
        [l for l in jax.tree_util.tree_leaves(st.opt_state)
         if hasattr(l, "ndim") and l.ndim == 1 and
         l.shape == st.post.mu.shape])
    assert adam_mu and all(len(a.sharding.device_set) == 8 for a in adam_mu)
    # BN stats replicated
    bn = jax.tree_util.tree_leaves(st.batch_stats)
    assert all(a.sharding.is_fully_replicated for a in bn)


def test_mc_sharding_eval():
    """MC draws sharded over the 'mc' axis produce valid metrics."""
    bundle = make_multimodal_bundle(3, SPEC, jax.random.PRNGKey(0), TINY)
    mesh = M.make_mesh(MeshSpec(data=2, mc=4))
    estep = make_eval_step(bundle.module, bundle.meta, SPEC, num_mc=4,
                           mc_chunk=4, impl="jnp",
                           ws_sharding=M.mc_sharding(mesh))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(4, 32, 32, 1)).astype(np.float32))
    labels = jnp.asarray(np.zeros(4, np.int32))
    with jax.set_mesh(mesh):
        m = estep(bundle.post, bundle.batch_stats,
                  (M.shard_batch(mesh, x), M.shard_batch(mesh, x),
                   M.shard_batch(mesh, s)),
                  M.shard_batch(mesh, labels),
                  M.shard_batch(mesh, jnp.ones((4,))),
                  jax.random.PRNGKey(3), 0.1)
    assert np.isfinite(float(m["loss"]))
    assert m["predicted"].shape == (4,)
    assert np.isfinite(np.asarray(m["epistemic_variance"])).all()


# ---------------------------------------------------------------------------
# Multi-process input feeding (DDP-analogue, SURVEY.md §2.8)
# ---------------------------------------------------------------------------

def test_host_shard_indices_cover_disjointly():
    """Across process counts and ragged dataset sizes, the per-host shards
    partition range(n): disjoint, complete, contiguous — the
    DistributedSampler analogue (train/multimodal.py:109-110)."""
    from multimodal_auv_tpu.parallel.distributed import host_shard_indices

    for n in (1, 5, 8, 9, 10, 17, 64):
        for pc in (1, 2, 3, 4, 8):
            shards = [host_shard_indices(n, process_index=pi, process_count=pc)
                      for pi in range(pc)]
            flat = [i for s in shards for i in s]
            assert flat == list(range(n)), (n, pc)
            sizes = [len(s) for s in shards]
            assert max(sizes) - min(s for s in sizes if True) <= -(-n // pc)


def test_make_global_batch_places_data_sharded():
    from multimodal_auv_tpu.parallel.distributed import make_global_batch

    mesh = M.make_mesh(MeshSpec(data=8, mc=1))
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    (gx,) = make_global_batch(mesh, [x])
    assert gx.shape == (8, 3)
    np.testing.assert_allclose(np.asarray(gx), x)
    # each device holds exactly its batch row
    for shard in gx.addressable_shards:
        np.testing.assert_allclose(np.asarray(shard.data),
                                   x[shard.index[0]])


def test_simulated_two_host_ragged_feed_matches_single_host():
    """Simulate two hosts feeding a ragged global batch: each host takes its
    host_shard_indices slice, pads its final local batch with mask=0 rows
    (the loops' _pad_batch machinery), and the concatenated global batch +
    mask must reproduce the single-host padded batch exactly."""
    from multimodal_auv_tpu.engine.loops import _pad_batch
    from multimodal_auv_tpu.parallel.distributed import host_shard_indices

    n, pc = 10, 2
    per_host_nominal = 3  # global batch 6, last global batch ragged (4 valid)
    rng = np.random.default_rng(0)
    data = rng.normal(size=(n, 4)).astype(np.float32)
    labels = (np.arange(n) % 3).astype(np.int32)

    def host_batches(pi):
        idx = host_shard_indices(n, process_index=pi, process_count=pc)
        out = []
        for k in range(0, len(idx), per_host_nominal):
            sel = idx[k:k + per_host_nominal]
            (arr,), lab, mask = _pad_batch([data[sel]], labels[sel],
                                           per_host_nominal)
            out.append((arr, lab, mask))
        return out

    b0, b1 = host_batches(0), host_batches(1)
    assert len(b0) == len(b1)  # equal step counts -- no deadlocked host
    # global view of the last (ragged) step
    ga = np.concatenate([b0[-1][0], b1[-1][0]])
    gm = np.concatenate([b0[-1][2], b1[-1][2]])
    assert ga.shape[0] == pc * per_host_nominal
    assert gm.sum() == 4  # 10 - 6 valid rows in the ragged step
    valid_rows = ga[gm > 0]
    np.testing.assert_allclose(
        valid_rows, np.concatenate([data[3:5], data[8:10]]))


def test_sharded_train_step_bf16_weights_runs():
    """Mixed-precision training (bf16 sampled weights, f32 master) must
    compose with FSDP posterior sharding + batch DP on a mesh: the step
    compiles, produces a finite loss, and leaves the posterior f32."""
    bundle = make_multimodal_bundle(3, SPEC, jax.random.PRNGKey(0), TINY)
    tx = make_optimizer(1e-3)
    step = make_train_step(bundle.module, bundle.meta, SPEC, tx, num_mc=2,
                           impl="jnp", sample_dtype=jnp.bfloat16)
    state = BayesTrainState(post=bundle.post, opt_state=tx.init(bundle.post),
                            batch_stats=bundle.batch_stats,
                            step=jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(8, 32, 32, 1)).astype(np.float32))
    labels = jnp.asarray((np.arange(8) % 3).astype(np.int32))
    mask = jnp.ones((8,))

    mesh = M.make_mesh(MeshSpec(data=4, mc=2))
    with jax.set_mesh(mesh):
        st = M.shard_state(mesh, state, fsdp=True)
        new_state, m = step(st, (M.shard_batch(mesh, x),
                                 M.shard_batch(mesh, x),
                                 M.shard_batch(mesh, s)),
                            M.shard_batch(mesh, labels),
                            M.shard_batch(mesh, mask),
                            jax.random.PRNGKey(2), 0.5, 8.0)
    assert np.isfinite(float(m["loss"]))
    assert new_state.post.mu.dtype == jnp.float32
    assert float(jnp.abs(new_state.post.mu - st.post.mu).max()) > 0


def test_sharded_checkpoint_roundtrip(tmp_path):
    """VERDICT r2 #3: orbax-NATIVE sharded save/restore of an FSDP-sharded
    train state — no host gather (engine/checkpointing.py). The restored
    arrays must carry the template's shardings, equal the saved values
    bit-for-bit, and a post-restore train step must run."""
    from multimodal_auv_tpu.engine.checkpointing import (
        restore_train_state,
        save_train_state,
    )

    spec = BNNPriorSpec()
    arch = ArchConfig.micro(image_size=32)
    bundle = make_multimodal_bundle(3, spec, jax.random.PRNGKey(0), arch)
    tx = make_optimizer(1e-3)
    mesh = M.make_mesh(MeshSpec(data=4, mc=2, fsdp=True))
    step = make_train_step(bundle.module, bundle.meta, spec, tx, num_mc=2,
                           mc_chunk=2, impl="jnp",
                           ws_sharding=M.mc_sharding(mesh))

    rng = np.random.default_rng(0)
    inputs = tuple(jnp.asarray(rng.normal(size=(8, 32, 32, c)), jnp.float32)
                   for c in (3, 3, 1))
    labels = jnp.asarray(np.arange(8) % 3, jnp.int32)
    mask = jnp.ones((8,), jnp.float32)
    with jax.set_mesh(mesh):
        state = BayesTrainState(post=bundle.post,
                                opt_state=tx.init(bundle.post),
                                batch_stats=bundle.batch_stats,
                                step=jnp.zeros((), jnp.int32))
        state = M.shard_state(mesh, state, fsdp=True)
        b = tuple(M.shard_batch(mesh, x) for x in inputs)
        state, _ = step(state, b, M.shard_batch(mesh, labels),
                        M.shard_batch(mesh, mask), jax.random.PRNGKey(1),
                        0.5, 8.0)
        jax.block_until_ready(state.post.mu)
    assert not state.post.mu.sharding.is_fully_replicated  # truly sharded

    path = str(tmp_path / "sharded_state")
    save_train_state(path, state, epoch=3,
                     scheduler_counts={"multimodal_model": 2})

    with jax.set_mesh(mesh):
        template = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x) if hasattr(x, "dtype") else x, state)
        restored, epoch, sched = restore_train_state(path, template)
    assert epoch == 3 and sched == {"multimodal_model": 2}
    assert restored.post.mu.sharding == state.post.mu.sharding
    np.testing.assert_array_equal(np.asarray(restored.post.mu),
                                  np.asarray(state.post.mu))
    np.testing.assert_array_equal(np.asarray(restored.post.rho),
                                  np.asarray(state.post.rho))
    for a, b_ in zip(jax.tree_util.tree_leaves(restored.opt_state),
                     jax.tree_util.tree_leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    with jax.set_mesh(mesh):
        inp = tuple(M.shard_batch(mesh, x) for x in inputs)
        state2, metrics = step(restored, inp, M.shard_batch(mesh, labels),
                               M.shard_batch(mesh, mask),
                               jax.random.PRNGKey(2), 0.5, 8.0)
        jax.block_until_ready(state2.post.mu)
    assert np.isfinite(float(metrics["loss"]))


def test_shard_state_fsdp_only_shards_packed_leaves():
    """Only leaves NAMED mu/rho (the packed posterior arrays and their
    Adam moment copies) may be FSDP-sharded. The old any-key-in-path test
    also matched the Adam state's own `mu` moment FIELD, so first-moment
    copies of deterministic BN scale/bias leaves got sharded — a hard
    device_put error whenever the BN channel count doesn't divide the
    device count (e.g. width-12 BN on 8 devices)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_auv_tpu.config import BNNPriorSpec
    from multimodal_auv_tpu.engine.optim import make_optimizer
    from multimodal_auv_tpu.engine.steps import BayesTrainState
    from multimodal_auv_tpu.models.model_utils import (
        ArchConfig,
        make_multimodal_bundle,
    )
    from multimodal_auv_tpu.parallel.mesh import make_mesh, shard_state

    # width 12 -> BN channel counts (12, 48, ...) not divisible by 8
    arch = ArchConfig(stage_sizes=(1, 1), width=12, image_size=32,
                      dtype=jnp.float32)
    bundle = make_multimodal_bundle(3, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    arch)
    tx = make_optimizer(1e-3)
    state = BayesTrainState(post=bundle.post,
                            opt_state=tx.init(bundle.post),
                            batch_stats=bundle.batch_stats,
                            step=jnp.zeros((), jnp.int32))
    mesh = make_mesh()
    sharded = shard_state(mesh, state, fsdp=True)  # raised before the fix

    def named_leaves(tree):
        out = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            keys = [getattr(p, "name", getattr(p, "key", "")) for p in path]
            out.append((keys, leaf))
        return out

    for keys, leaf in named_leaves(sharded):
        spec = leaf.sharding.spec if hasattr(leaf.sharding, "spec") else None
        is_packed = bool(keys) and keys[-1] in ("mu", "rho")
        if is_packed and np.ndim(leaf) == 1:
            assert spec is not None and any(spec), keys  # sharded
        elif spec is not None:
            assert not any(spec), keys  # replicated


# ---------------------------------------------------------------------------
# Mesh-enabled PRODUCTION training pipelines (round 3): the epoch loops /
# pipelines themselves — not just the bare steps — running over a mesh.
# ---------------------------------------------------------------------------

def test_unimodal_pipeline_mesh_matches_single_device(tmp_path, monkeypatch):
    """run_unimodal_training(mesh_spec=...) must produce the same trained
    posterior as the single-device run: same fixture tree, seed, and epoch
    count; DP over 'data' + FSDP posterior sharding only changes the
    device layout, not the math (collective reduction order => fp-level
    tolerance)."""
    from tests.fixtures.make_tree import make_training_tree

    from multimodal_auv_tpu.config import MeshSpec
    from multimodal_auv_tpu.models.model_utils import ArchConfig
    from multimodal_auv_tpu.pipelines.unimodal import run_unimodal_training

    monkeypatch.chdir(tmp_path)
    root = make_training_tree(str(tmp_path / "data"), n_samples=6)
    kw = dict(model_type="sss", num_epochs=2, num_mc=2, batch_size=2,
              lr=1e-3, arch=ArchConfig.micro(image_size=64), seed=0,
              handle_preemption=False)

    s_single = run_unimodal_training(root, csv_dir=str(tmp_path / "c1"), **kw)
    s_mesh = run_unimodal_training(
        root, csv_dir=str(tmp_path / "c2"),
        mesh_spec=MeshSpec(data=2, mc=1, fsdp=True), **kw)

    # the mesh run's posterior lives sharded over 2 devices
    assert len(s_mesh.post.mu.sharding.device_set) == 2

    # Loss trajectories must agree tightly (CSV ledgers of both runs).
    # The POSTERIORS can only agree to ~lr per step: Adam normalises each
    # update to ~±lr, so the fp-level reduction-reorder difference between
    # the sharded and single-device gradients flips some coordinates'
    # update direction — bounded drift, not divergence.
    import csv as _csv
    import os

    def losses(d):
        with open(os.path.join(d, "unimodal_sss_train_results.csv")) as f:
            return [float(r["Loss"]) for r in _csv.DictReader(f)]

    l1, l2 = losses(str(tmp_path / "c1")), losses(str(tmp_path / "c2"))
    assert len(l1) == len(l2) >= 1
    np.testing.assert_allclose(l1, l2, rtol=2e-3)

    n_steps = 2 * len(l1)  # 2 train batches per epoch (4 samples, batch 2)
    drift = float(np.max(np.abs(np.asarray(s_single.post.mu)
                                - np.asarray(s_mesh.post.mu))))
    assert drift <= 3 * kw["lr"] * n_steps, drift


@pytest.mark.slow
def test_multimodal_pipeline_mesh_smoke(tmp_path, monkeypatch):
    """The from-scratch pipeline end-to-end on a (data=2, mc=2, fsdp) mesh:
    DP batches + FSDP posterior + MC-ensemble sharding through the REAL
    epoch loops (CSV ledgers, checkpoint cadence, eval + confusion
    matrices)."""
    import os

    from tests.fixtures.make_tree import make_training_tree

    from multimodal_auv_tpu.config import BNNPriorSpec, MeshSpec
    from multimodal_auv_tpu.models.model_utils import ArchConfig
    from multimodal_auv_tpu.pipelines.training import (
        run_AUV_training_from_scratch,
    )

    monkeypatch.chdir(tmp_path)
    root = make_training_tree(str(tmp_path / "data"), n_samples=6)
    ok = run_AUV_training_from_scratch(
        const_bnn_prior_parameters=BNNPriorSpec().to_dict(),
        lr_multimodal_model=1e-3,
        num_epochs_multimodal=1,
        num_mc=2,
        bathy_patch_base_raw=30,
        sss_patch_base_raw=30,
        batch_size_multimodal=2,
        root_dir=root,
        num_classes=0,
        arch=ArchConfig.micro(image_size=64),
        mesh_spec=MeshSpec(data=2, mc=2, fsdp=True),
        handle_preemption=False,
    )
    assert ok is True
    csvs = os.path.join(root, "csvs")
    assert os.path.exists(os.path.join(csvs, "multimodal_train_results.csv"))
    assert os.path.exists(os.path.join(csvs, "multimodal_eval_results.csv"))


def test_pipeline_mesh_batch_divisibility_guard(tmp_path, monkeypatch):
    """A batch size not divisible by the 'data' axis must fail loudly at
    setup, not mid-epoch inside XLA."""
    from tests.fixtures.make_tree import make_training_tree

    from multimodal_auv_tpu.config import MeshSpec
    from multimodal_auv_tpu.models.model_utils import ArchConfig
    from multimodal_auv_tpu.pipelines.unimodal import run_unimodal_training

    monkeypatch.chdir(tmp_path)
    root = make_training_tree(str(tmp_path / "data"), n_samples=6)
    with pytest.raises(ValueError, match="divisible"):
        run_unimodal_training(root, model_type="sss", num_epochs=1, num_mc=2,
                              batch_size=3, arch=ArchConfig.micro(image_size=64),
                              mesh_spec=MeshSpec(data=2), csv_dir=str(tmp_path / "c"),
                              handle_preemption=False)


def test_mesh_resume_matches_uninterrupted(tmp_path, monkeypatch):
    """True resume THROUGH the mesh path: the every-epoch train-state
    checkpoint of an FSDP-sharded run restores into the sharded template
    and the resumed run is bit-identical to an uninterrupted one — the
    pipeline-level integration of the dryrun's sharded save/restore
    round-trip (__graft_entry__.py).

    Both runs use num_epochs=3: the KL anneal weight 2^(e+1)/2^E depends
    on the TOTAL epoch count (engine/loops.py), so the interrupted run is
    preempted mid-epoch via a counting preemption_guard at constant
    num_epochs — a 2-epoch run then "continuing" to 3 would be a
    different loss schedule, not a resume (same trap pinned by
    tests/test_engine.py::test_unimodal_resume_matches_uninterrupted)."""
    from tests.fixtures.make_tree import make_training_tree

    from multimodal_auv_tpu.config import MeshSpec
    from multimodal_auv_tpu.engine.preemption import PreemptionGuard
    from multimodal_auv_tpu.models.model_utils import ArchConfig
    from multimodal_auv_tpu.pipelines.unimodal import run_unimodal_training

    monkeypatch.chdir(tmp_path)
    root = make_training_tree(str(tmp_path / "data"), n_samples=6)
    kw = dict(model_type="sss", num_epochs=3, num_mc=2, batch_size=2,
              lr=1e-3, arch=ArchConfig.micro(image_size=64), seed=0,
              handle_preemption=False,
              mesh_spec=MeshSpec(data=2, mc=1, fsdp=True))

    s_full = run_unimodal_training(
        root, csv_dir=str(tmp_path / "full"),
        resume_checkpoint=str(tmp_path / "ck_full"), **kw)

    class TriggerAtPoll(PreemptionGuard):
        """Fires the cooperative stop flag at the Nth batch-boundary
        poll — a deterministic in-process stand-in for SIGTERM."""

        def __init__(self, at):
            super().__init__(signals=())
            self.at, self.polls = at, 0

        def check(self):
            self.polls += 1
            if self.polls >= self.at:
                self.triggered = True
            return self.triggered

    # 6 samples / batch 2 = 3 train batches per epoch; poll 5 lands in
    # the middle of epoch 1, after epoch 0's boundary checkpoint exists.
    run_unimodal_training(root, csv_dir=str(tmp_path / "part"),
                          resume_checkpoint=str(tmp_path / "ck_part"),
                          preemption_guard=TriggerAtPoll(5), **kw)
    s_resumed = run_unimodal_training(
        root, csv_dir=str(tmp_path / "part"),
        resume_checkpoint=str(tmp_path / "ck_part"), **kw)

    assert len(s_resumed.post.mu.sharding.device_set) == 2
    assert np.array_equal(np.asarray(s_full.post.mu),
                          np.asarray(s_resumed.post.mu))
    assert np.array_equal(np.asarray(s_full.post.rho),
                          np.asarray(s_resumed.post.rho))


class _DictDataset:
    """Minimal MultimodalFolderDataset batch-dict schema for loader tests."""

    def __init__(self, n=11, num_classes=3, seed=0):
        rng = np.random.default_rng(seed)
        self.x = rng.uniform(size=(n, 8, 8, 3)).astype(np.float32)
        self.s = rng.uniform(size=(n, 8, 8, 1)).astype(np.float32)
        self.labels = (np.arange(n) % num_classes).astype(np.int32)

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, i):
        return {"main_image": self.x[i], "bathy_image": self.x[i],
                "sss_image": self.s[i], "patch_bathy": {}, "patch_sss": {},
                "label": np.int32(self.labels[i])}


def test_host_shard_loader_global_view():
    """HostShardLoader (data/loaders.py) is the DistributedSampler
    analogue: every host sees the same GLOBAL batch order; owned rows are
    real, unowned image rows are zero placeholders, and labels are
    globally correct on every host (eval ledgers need them). Assembling
    each host's owned slice reconstructs the plain loader's batch."""
    from multimodal_auv_tpu.data.loaders import DataLoader, HostShardLoader

    ds = _DictDataset(n=11)
    B, P = 4, 2
    ref = DataLoader(ds, B, shuffle=True, seed=7, num_workers=0)
    shards = [HostShardLoader(ds, B, shuffle=True, seed=7, num_workers=0,
                              process_index=p, process_count=P)
              for p in range(P)]
    for ep in range(2):
        ref.set_epoch(ep)
        for sl in shards:
            sl.set_epoch(ep)
        per = B // P
        for gb, *host_batches in zip(iter(ref), *(iter(s) for s in shards)):
            v = gb["label"].shape[0]
            for p, hb in enumerate(host_batches):
                # global-shaped (may exceed the ragged tail's v rows only
                # via the loop's padding, which happens downstream)
                assert hb["label"].shape[0] == v
                # labels are globally correct on EVERY host
                np.testing.assert_array_equal(hb["label"], gb["label"])
                lo, hi = p * per, min((p + 1) * per, v)
                if lo < v:
                    np.testing.assert_array_equal(
                        hb["main_image"][lo:hi], gb["main_image"][lo:hi])
                # unowned rows are zero placeholders
                for j in range(v):
                    if not (lo <= j < hi):
                        assert not hb["main_image"][j].any()


def test_host_shard_loader_rejects_indivisible_batch():
    from multimodal_auv_tpu.data.loaders import HostShardLoader

    with pytest.raises(ValueError, match="divisible"):
        HostShardLoader(_DictDataset(n=6), 5, process_index=0,
                        process_count=2)
