"""The installed-package self-check must pass end-to-end (it is the
working equivalent of the reference's broken run_installed_package_tests.py
— see multimodal_auv_tpu/selfcheck.py)."""
import io
import sys
from contextlib import redirect_stdout


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
