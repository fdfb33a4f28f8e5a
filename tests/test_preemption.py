"""Cooperative SIGTERM preemption (engine/preemption.py).

TPU fleets deliver SIGTERM with a short grace window before SIGKILL;
the reference's only failure story is a bare-except weight dump
(/root/reference/src/Multimodal_AUV/train/multimodal.py:194-200). These
tests send REAL signals to this process and pin the full contract:
batch-boundary stop, no partial-epoch checkpoint, handler restoration,
second-signal escalation, and — the load-bearing property — that a
SIGTERM-preempted run resumed from its checkpoint is BIT-equal to an
uninterrupted run.
"""
import os
import signal
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.data.loaders import DataLoader
from multimodal_auv_tpu.engine import checkpointing as ckpt
from multimodal_auv_tpu.engine.loops import train_and_evaluate_multimodal_model
from multimodal_auv_tpu.engine.optim import BayesTrainState, StepLR, make_optimizer
from multimodal_auv_tpu.engine.preemption import (
    PreemptionGuard,
    maybe_guard,
    null_guard,
)
from multimodal_auv_tpu.engine.steps import make_eval_step, make_train_step
from multimodal_auv_tpu.models.model_utils import ArchConfig, make_multimodal_bundle
from multimodal_auv_tpu.utils.tb import SummaryWriter

S = 32
SPEC = BNNPriorSpec()
TINY = ArchConfig.tiny(image_size=S)


def _drain_signal(guard, timeout=5.0):
    """Spin until the interpreter has run the pending signal handler."""
    import time

    deadline = time.monotonic() + timeout
    while not guard.triggered and time.monotonic() < deadline:
        time.sleep(0.001)
    return guard.triggered


def test_guard_sets_flag_and_restores_handler():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.triggered and not g.check()
        os.kill(os.getpid(), signal.SIGTERM)
        assert _drain_signal(g)
        assert g.check()
        # first signal must NOT raise — it may land inside an orbax commit
    assert signal.getsignal(signal.SIGTERM) is prev


def test_second_signal_escalates_to_keyboard_interrupt():
    with PreemptionGuard() as g:
        os.kill(os.getpid(), signal.SIGTERM)
        assert _drain_signal(g)
        with pytest.raises(KeyboardInterrupt, match="SIGTERM"):
            os.kill(os.getpid(), signal.SIGTERM)
            # the raise fires at an interpreter checkpoint
            for _ in range(10_000_000):
                pass
            pytest.fail("escalation never delivered")


def test_guard_off_main_thread_degrades_to_manual_flag():
    prev = signal.getsignal(signal.SIGTERM)
    out = {}

    def worker():
        with PreemptionGuard() as g:
            out["installed_handler"] = signal.getsignal(signal.SIGTERM)
            g.trigger()
            out["triggered"] = g.triggered

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert out["triggered"]
    # no handler was installed from the worker thread
    assert out["installed_handler"] is prev


def test_null_guard_never_installs_or_triggers():
    prev = signal.getsignal(signal.SIGTERM)
    with null_guard() as g:
        assert signal.getsignal(signal.SIGTERM) is prev
        assert not g.check()
    with maybe_guard(False) as g:
        assert signal.getsignal(signal.SIGTERM) is prev
    with maybe_guard(True) as g:
        assert signal.getsignal(signal.SIGTERM) is not prev
    assert signal.getsignal(signal.SIGTERM) is prev


# ---------------------------------------------------------------------------
# end-to-end: SIGTERM mid-epoch -> resume is bit-equal to uninterrupted
# ---------------------------------------------------------------------------

class SyntheticMultimodalDataset:
    def __init__(self, n=8, num_classes=3, seed=0):
        rng = np.random.default_rng(seed)
        self.x = rng.uniform(size=(n, S, S, 3)).astype(np.float32)
        self.s = rng.uniform(size=(n, S, S, 1)).astype(np.float32)
        self.y = rng.integers(0, num_classes, size=(n,))

    def __len__(self):
        return len(self.y)

    def __getitem__(self, i):
        return {"main_image": self.x[i], "bathy_image": self.x[i],
                "sss_image": self.s[i], "patch_bathy": {}, "patch_sss": {},
                "label": self.y[i]}


class SigtermDuringEpoch:
    """Delegating loader that SIGTERMs this process while yielding batch
    ``at_batch`` of iteration ``at_iter`` — the signal therefore arrives
    DURING a train epoch, exactly like a platform preemption."""

    def __init__(self, loader, at_iter: int, at_batch: int):
        self.loader, self.at_iter, self.at_batch = loader, at_iter, at_batch
        self.count = 0

    def __len__(self):
        return len(self.loader)

    def __getattr__(self, name):  # batch_size, set_epoch, ...
        return getattr(self.loader, name)

    def __iter__(self):
        self.count += 1
        for j, b in enumerate(self.loader):
            if self.count == self.at_iter and j == self.at_batch:
                os.kill(os.getpid(), signal.SIGTERM)
            yield b


def _mm_state(lr=1e-3):
    bundle = make_multimodal_bundle(3, SPEC, jax.random.PRNGKey(0), TINY)
    tx = make_optimizer(lr, weight_decay=0.0)
    state = BayesTrainState(post=bundle.post, opt_state=tx.init(bundle.post),
                            batch_stats=bundle.batch_stats,
                            step=jnp.zeros((), jnp.int32))
    return bundle, tx, state


def _fresh(train_loader_wrap=None):
    bundle, tx, state = _mm_state()
    tstep = make_train_step(bundle.module, bundle.meta, SPEC, tx,
                            num_mc=2, impl="jnp")
    estep = make_eval_step(bundle.module, bundle.meta, SPEC,
                           num_mc=2, impl="jnp")
    ds = SyntheticMultimodalDataset(n=8)
    tl = DataLoader(ds, batch_size=4, num_workers=0, shuffle=True)
    if train_loader_wrap is not None:
        tl = train_loader_wrap(tl)
    return state, tstep, estep, tl, DataLoader(ds, batch_size=4, num_workers=0)


@pytest.mark.slow
def test_sigterm_preempted_run_resumes_bitexact(tmp_path):
    """The whole story at once: run A trains 4 epochs uninterrupted; run B
    gets a real SIGTERM during epoch 1's second batch — the orchestrator
    must stop at the batch boundary WITHOUT saving partial-epoch state —
    then a fresh process resumes run B to completion. Final posterior and
    optimizer state must be bit-equal to run A (epoch-indexed keys make
    the replayed epoch identical)."""
    pA, pB = str(tmp_path / "ckA"), str(tmp_path / "ckB")

    # run A: uninterrupted
    state, tstep, estep, tl, el = _fresh()
    train_and_evaluate_multimodal_model(
        tl, el, 4, tstep, estep, state, StepLR(1e-3, 1, 0.5),
        str(tmp_path / "csvA"), SummaryWriter(str(tmp_path / "tbA")),
        jax.random.PRNGKey(7), checkpoint_resume_path=pA)

    # run B: SIGTERM while epoch 1 (2nd loader iteration) yields batch 1
    state, tstep, estep, tl, el = _fresh(
        lambda l: SigtermDuringEpoch(l, at_iter=2, at_batch=1))
    with PreemptionGuard() as guard:
        train_and_evaluate_multimodal_model(
            tl, el, 4, tstep, estep, state, StepLR(1e-3, 1, 0.5),
            str(tmp_path / "csvB"), SummaryWriter(str(tmp_path / "tbB")),
            jax.random.PRNGKey(7), checkpoint_resume_path=pB,
            preemption_guard=guard)
    assert guard.triggered

    # the checkpoint must be the epoch-0 boundary (epoch 1 was partial):
    # resuming replays epoch 1 from scratch
    _, _, stateT = _mm_state()
    _, saved_epoch, _ = ckpt.restore_train_state(pB, stateT)
    assert saved_epoch == 1, "partial epoch 1 must not have been saved"
    # the partial epoch wrote no CSV row: only epoch 0's
    rows = (tmp_path / "csvB" / "multimodal_train_results.csv").read_text()
    assert rows.count("\n") == 2  # header + epoch 0

    # fresh process: resume B to completion (no signal this time)
    state, tstep, estep, tl, el = _fresh()
    train_and_evaluate_multimodal_model(
        tl, el, 4, tstep, estep, state, StepLR(1e-3, 1, 0.5),
        str(tmp_path / "csvB"), SummaryWriter(str(tmp_path / "tbB")),
        jax.random.PRNGKey(7), checkpoint_resume_path=pB)

    _, _, stateT = _mm_state()
    sA, eA, _ = ckpt.restore_train_state(pA, stateT)
    sB, eB, _ = ckpt.restore_train_state(pB, stateT)
    assert eA == eB == 4
    np.testing.assert_array_equal(np.asarray(sA.post.mu), np.asarray(sB.post.mu))
    np.testing.assert_array_equal(np.asarray(sA.post.rho), np.asarray(sB.post.rho))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), sA.opt_state, sB.opt_state)


def test_cli_returns_75_on_preempted_training(monkeypatch):
    """The train/retrain CLIs must exit PREEMPTED_EXIT_CODE (75,
    EX_TEMPFAIL) when the run was preempted, so schedulers re-run the job
    instead of marking it complete."""
    import multimodal_auv_tpu.pipelines as pipelines
    from multimodal_auv_tpu.cli import retraining_cli, training_from_scratch_cli
    from multimodal_auv_tpu.engine.preemption import PREEMPTED_EXIT_CODE

    def fake_scratch(*a, preemption_guard=None, **k):
        preemption_guard.trigger()  # simulate SIGTERM mid-run
        return True

    monkeypatch.setattr(pipelines, "run_AUV_training_from_scratch",
                        fake_scratch)
    rc = training_from_scratch_cli(["--root_dir", "/tmp/x", "--tiny"])
    assert rc == PREEMPTED_EXIT_CODE

    def fake_retrain(*a, preemption_guard=None, **k):
        preemption_guard.trigger()
        return True

    monkeypatch.setattr(pipelines, "run_auv_retraining", fake_retrain)
    rc = retraining_cli(["--data_dir", "/tmp/x", "--tiny",
                         "--allow_random_init"])
    assert rc == PREEMPTED_EXIT_CODE

    # not preempted -> plain success/failure codes
    monkeypatch.setattr(pipelines, "run_AUV_training_from_scratch",
                        lambda *a, **k: True)
    assert training_from_scratch_cli(["--root_dir", "/tmp/x"]) == 0
    monkeypatch.setattr(pipelines, "run_AUV_training_from_scratch",
                        lambda *a, **k: False)
    assert training_from_scratch_cli(["--root_dir", "/tmp/x"]) == 1


def test_pipeline_uses_external_guard(monkeypatch, tmp_path):
    """A caller-provided (already-entered) guard must be used directly —
    the pipeline must not install its own handlers over it."""
    import signal

    from multimodal_auv_tpu.engine import loops

    seen = {}

    def fake_orchestrator(*a, preemption_guard=None, **k):
        seen["guard"] = preemption_guard
        seen["handler"] = signal.getsignal(signal.SIGTERM)
        return a[5]  # state passthrough

    monkeypatch.setattr(loops, "train_and_evaluate_unimodal_model",
                        fake_orchestrator)
    import multimodal_auv_tpu.pipelines.unimodal as uni

    monkeypatch.setattr(uni, "train_and_evaluate_unimodal_model",
                        fake_orchestrator)

    # tiny tree for the loader
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from fixtures.make_tree import make_training_tree

    root = make_training_tree(str(tmp_path / "dives"), n_samples=4)
    outer_prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as mine:
        uni.run_unimodal_training(root, num_epochs=1, num_mc=1, batch_size=2,
                                  arch=TINY, preemption_guard=mine)
    assert seen["guard"] is mine
    # the pipeline did not stack a second handler over the caller's:
    # during the call the installed handler was the OUTER guard's
    assert seen["handler"].__self__ is mine
    assert signal.getsignal(signal.SIGTERM) is outer_prev
