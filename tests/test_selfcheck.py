"""The installed-package self-check must pass end-to-end (it is the
working equivalent of the reference's broken run_installed_package_tests.py
— see multimodal_auv_tpu/selfcheck.py)."""
import io
import sys
from contextlib import redirect_stdout

import pytest


@pytest.mark.slow
def test_selfcheck_passes():
    from multimodal_auv_tpu.selfcheck import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([])
    out = buf.getvalue()
    assert rc == 0, out
    assert "FAIL" not in out, out
    # every advertised check ran
    for name in ("inference CSV header", "inference CSV rows",
                 "training pipeline returned ok", "training ledger written",
                 "training ledger rows"):
        assert f"PASS {name}" in out, out


def test_selfcheck_is_offline_and_guards_training(monkeypatch):
    """(a) selfcheck pins HF_HUB_OFFLINE so a networked host never
    downloads the flagship checkpoint for the tiny arch to drop; (b) a
    crash in the TRAINING half becomes a FAIL line + summary, never an
    escaping traceback (same contract as the inference half)."""
    import multimodal_auv_tpu.pipelines as pipelines
    from multimodal_auv_tpu.selfcheck import main

    monkeypatch.delenv("HF_HUB_OFFLINE", raising=False)
    seen = {}

    def fake_infer(**kw):
        seen["offline"] = __import__("os").environ.get("HF_HUB_OFFLINE")
        raise RuntimeError("inference boom")

    def fake_train(**kw):
        raise RuntimeError("training boom")

    monkeypatch.setattr(pipelines, "run_auv_inference", fake_infer)
    monkeypatch.setattr(pipelines, "run_AUV_training_from_scratch",
                        fake_train)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([])  # must NOT raise
    out = buf.getvalue()
    assert rc == 1
    assert seen["offline"] == "1"
    assert "FAIL inference pipeline ran" in out, out
    assert "FAIL training pipeline ran" in out, out
    assert "0/2 checks passed" in out, out
