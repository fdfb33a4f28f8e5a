"""L0 utils + CLI arg handling — analogue of the reference's
unittests/test_utils.py plus CLI coverage it lacks."""
import os

import jax
import numpy as np
import pytest

from multimodal_auv_tpu.utils.devices import (
    check_model_devices,
    get_available_devices,
    setup_environment_and_devices,
)


def test_get_available_devices_virtual_mesh():
    devs = get_available_devices()
    assert len(devs) == 8  # conftest forces 8 virtual CPU devices
    assert all(d.platform == "cpu" for d in devs)


def test_setup_environment_and_devices(monkeypatch, tmp_path):
    monkeypatch.setenv("MULTIMODAL_AUV_ROOT", str(tmp_path))
    root, devs = setup_environment_and_devices()
    assert root == str(tmp_path)
    assert len(devs) == 8
    monkeypatch.delenv("MULTIMODAL_AUV_ROOT")
    root2, _ = setup_environment_and_devices("/somewhere")
    assert root2 == "/somewhere"


def test_check_model_devices_logs(caplog):
    import logging

    tree = {"a": jax.numpy.ones((2, 2))}
    with caplog.at_level(logging.INFO,
                         logger="multimodal_auv_tpu.utils.devices"):
        check_model_devices(tree)
    assert any("a" in r.message for r in caplog.records)


def test_tb_writer_real_tensorboard_reads_our_events(tmp_path):
    """The from-scratch tfevents encoder (TFRecord framing + masked CRC32C
    + hand-encoded Event protos, no torch/tensorboard dependency) must be
    readable by the REAL TensorBoard event loader, values exact."""
    import glob

    import multimodal_auv_tpu.utils.tb as tb

    w = tb.SummaryWriter(str(tmp_path / "tb"))
    w.add_scalar("Loss/train", 1.5, 0)
    w.add_scalar("Loss/train", 1.25, 1)
    w.add_scalar("Accuracy/val", 0.75, 1)

    # CSV mirror
    rows = open(tmp_path / "tb" / "scalars.csv").read().strip().split("\n")
    assert len(rows) == 4

    pytest.importorskip("tensorboard")
    from tensorboard.backend.event_processing import event_file_loader

    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    # LegacyEventFileLoader yields raw Event protos; the non-legacy one
    # migrates simple_value into a tensor proto (data_compat)
    events = list(event_file_loader.LegacyEventFileLoader(files[0]).Load())
    assert events[0].file_version == "brain.Event:2"
    scalars = [(e.step, v.tag, v.simple_value)
               for e in events[1:] for v in e.summary.value]
    assert scalars == [(0, "Loss/train", 1.5), (1, "Loss/train", 1.25),
                       (1, "Accuracy/val", 0.75)]
    assert all(e.wall_time > 0 for e in events)

    # handles stay open between scalars (no per-call open/close), and a
    # writer used again after close() transparently reopens in append mode
    w.close()
    w.add_scalar("Loss/train", 1.0, 2)
    w.close()
    events = list(event_file_loader.LegacyEventFileLoader(files[0]).Load())
    post = [(e.step, v.tag, v.simple_value)
            for e in events[1:] for v in e.summary.value]
    assert post[-1] == (2, "Loss/train", 1.0) and len(post) == 4


def test_tb_writer_crc32c_golden():
    """CRC32C vectors (RFC 3720 B.4): the checksum the TFRecord framing
    depends on must match the standard, not just round-trip."""
    from multimodal_auv_tpu.utils.tb import _crc32c, _masked_crc

    assert _crc32c(b"") == 0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA
    assert _masked_crc(b"123456789") == ((0xE3069283 >> 15 | (
        0xE3069283 << 17 & 0xFFFFFFFF)) + 0xA282EAD8) & 0xFFFFFFFF


def test_scheduler_steplr_semantics():
    from multimodal_auv_tpu.engine.optim import StepLR, kl_annealing_weight

    s = StepLR(1e-3, step_size=2, gamma=0.5)
    lrs = []
    for _ in range(5):
        lrs.append(s.lr)
        s.step()
    assert lrs == [1e-3, 1e-3, 5e-4, 5e-4, 2.5e-4]
    # KL annealing: 2^(e+1)/2^E (multimodal.py:80)
    assert kl_annealing_weight(0, 4) == pytest.approx(2 ** -3)
    assert kl_annealing_weight(3, 4) == pytest.approx(1.0)


def test_cli_help_and_bad_command(capsys):
    from multimodal_auv_tpu.cli import main

    assert main(["nope"]) == 2
    assert main([]) == 2
    with pytest.raises(SystemExit):
        main(["inference", "--help"])


def test_cli_inference_flag_parity():
    """Reference flags (cli.py:75-78) must parse."""
    import argparse

    from multimodal_auv_tpu import cli

    # patch the pipeline out; only flag parsing is under test
    captured = {}

    def fake(**kw):
        captured.update(kw)

    import multimodal_auv_tpu.pipelines as P

    orig = P.run_auv_inference
    P.run_auv_inference = fake
    try:
        rc = cli.inference_cli([
            "--data_dir", "/d", "--output_csv", "/o.csv",
            "--batch_size", "8", "--num_mc_samples", "20"])
    finally:
        P.run_auv_inference = orig
    assert rc == 0
    assert captured["data_directory"] == "/d"
    assert captured["batch_size"] == 8
    assert captured["num_mc_samples"] == 20


def test_cli_training_resume_flag_reaches_pipelines():
    """--resume_checkpoint must be plumbed to both training pipelines."""
    from multimodal_auv_tpu import cli
    import multimodal_auv_tpu.pipelines as P

    captured = {}

    def fake(**kw):
        captured.update(kw)
        return True

    orig_r, orig_s = P.run_auv_retraining, P.run_AUV_training_from_scratch
    P.run_auv_retraining = fake
    P.run_AUV_training_from_scratch = fake
    try:
        assert cli.retraining_cli([
            "--data_dir", "/d", "--resume_checkpoint", "/ck/r",
            "--tiny"]) == 0
        assert captured["resume_checkpoint"] == "/ck/r"
        captured.clear()
        assert cli.training_from_scratch_cli([
            "--root_dir", "/d", "--resume_checkpoint", "/ck/s",
            "--tiny"]) == 0
        assert captured["resume_checkpoint"] == "/ck/s"
    finally:
        P.run_auv_retraining = orig_r
        P.run_AUV_training_from_scratch = orig_s


def test_config_yaml_roundtrip(tmp_path):
    from multimodal_auv_tpu.config import BNNPriorSpec, load_yaml

    p = tmp_path / "c.yaml"
    p.write_text("num_classes: 5\nbnn:\n  moped_delta: 0.2\n"
                 "training:\n  num_mc: 7\nmesh:\n  fsdp: true\n")
    c = load_yaml(str(p))
    assert c.num_classes == 5
    assert c.bnn.moped_delta == 0.2
    assert c.training.num_mc == 7
    assert c.mesh.fsdp is True
    # BNNPriorSpec dict round-trip (reference param-dict convention)
    d = BNNPriorSpec().to_dict()
    assert BNNPriorSpec.from_dict(d) == BNNPriorSpec()


def test_hub_probe_honors_endpoint_port(monkeypatch):
    """ADVICE r2 (low): a custom HF_ENDPOINT with a non-443 port (private
    mirror) must be probed on ITS port, not hardcoded 443."""
    import socket

    from multimodal_auv_tpu.interop import hub

    for var in ("HTTP_PROXY", "http_proxy", "HTTPS_PROXY", "https_proxy",
                "ALL_PROXY", "all_proxy"):
        monkeypatch.delenv(var, raising=False)
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    try:
        monkeypatch.setenv("HF_ENDPOINT", f"http://127.0.0.1:{port}")
        assert hub._hub_reachable(timeout=1.0) is True
        monkeypatch.setenv("HF_ENDPOINT", "http://127.0.0.1:1")
        assert hub._hub_reachable(timeout=0.5) is False
    finally:
        srv.close()


def test_hub_probe_uses_proxy_when_set(monkeypatch):
    """Behind an HTTP(S) proxy the endpoint isn't directly connectable
    even though hf_hub_download (which honors *_PROXY) would succeed —
    the probe must test the PROXY address, not the endpoint."""
    import socket

    from multimodal_auv_tpu.interop import hub

    for var in ("HTTP_PROXY", "http_proxy", "HTTPS_PROXY", "https_proxy",
                "ALL_PROXY", "all_proxy"):
        monkeypatch.delenv(var, raising=False)
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    proxy_port = srv.getsockname()[1]
    try:
        # endpoint unreachable, proxy reachable -> reachable
        monkeypatch.setenv("HF_ENDPOINT", "http://127.0.0.1:1")
        monkeypatch.setenv("HTTP_PROXY", f"http://127.0.0.1:{proxy_port}")
        assert hub._hub_reachable(timeout=1.0) is True
        # https endpoint consults HTTPS_PROXY, not HTTP_PROXY
        monkeypatch.setenv("HF_ENDPOINT", "https://127.0.0.1:1")
        monkeypatch.delenv("HTTP_PROXY")
        monkeypatch.setenv("HTTPS_PROXY", f"http://127.0.0.1:{proxy_port}")
        assert hub._hub_reachable(timeout=1.0) is True
        # proxy also down -> unreachable
        monkeypatch.setenv("HTTPS_PROXY", "http://127.0.0.1:1")
        assert hub._hub_reachable(timeout=0.5) is False
    finally:
        srv.close()


def test_bench_mfu_flop_model():
    """bench.py's analytic FLOP model must reproduce the torchvision
    ResNet-50 figure (4.09 GMACs at 224^2) and scale to the 256^2
    multimodal operating point; MFU math sanity at known throughputs."""
    import bench

    gmacs = bench._resnet_conv_macs((3, 4, 6, 3), 64, 224, 3) / 1e9
    assert abs(gmacs - 4.087) < 0.02, gmacs
    per_draw = bench._model_flops_per_sample_per_draw()
    assert abs(per_draw / 1e9 - 31.82) < 0.2
    # 57 patches/s x 20 draws x 31.8 GF / 197 TF/s peak ~= 18.4%
    mfu = 57.0 * 20 * per_draw / 197e12
    assert 0.17 < mfu < 0.20


def test_bench_sigterm_emits_provisional_while_worker_blocked():
    """Capture hardening (round-4 verdict #1 / round-5): bench.main() runs
    the measurement on a worker thread so the MAIN thread can service
    SIGTERM even while the worker is stuck inside one long tunnel compile.
    A SIGTERM must produce the latest provisional as a parseable JSON line
    tagged partial=true, with exit code 0 — never rc!=0/parsed-null (the
    BENCH_r04.json failure)."""
    import json
    import signal
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys, time\n"
        f"sys.path.insert(0, {repo!r})\n"
        "import bench\n"
        "def fake_dispatch(args):\n"
        "    bench._WATCH.provisional({'metric': 'm', 'value': 1.5,\n"
        "                              'unit': 'u', 'vs_baseline': None})\n"
        "    print('# provisional recorded', file=sys.stderr, flush=True)\n"
        "    time.sleep(600)  # worker blocked 'in a compile'\n"
        "bench._dispatch = fake_dispatch\n"
        "sys.argv = ['bench.py', '--budget-s', '600']\n"
        "bench.main()\n")
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True)
    # wait until the worker has recorded the provisional — via a reader
    # thread so a silent/dead child can never hang this test (a blocking
    # `for line in proc.stderr` only re-checks a deadline per line)
    import threading

    recorded = threading.Event()
    stderr_lines = []

    def _watch_stderr():
        # sole owner of proc.stderr: drains to EOF so no second reader
        # (communicate would add one) ever touches the same pipe
        for line in proc.stderr:
            stderr_lines.append(line)
            if "provisional recorded" in line:
                recorded.set()
        recorded.set()  # EOF: unblock the waiter even if never printed

    threading.Thread(target=_watch_stderr, daemon=True).start()
    recorded.wait(60)  # on timeout, SIGTERM anyway: asserts will report
    proc.send_signal(signal.SIGTERM)
    out = proc.stdout.read()
    assert proc.wait(timeout=30) == 0, (proc.returncode, out,
                                        "".join(stderr_lines[-20:]))
    payload = json.loads(
        [ln for ln in out.splitlines() if ln.startswith("{")][-1])
    assert payload["partial"] is True
    assert payload["value"] == 1.5


@pytest.mark.slow
def test_bench_tiny_early_estimate_cpu():
    """The early-estimate provisional (conservative small-program
    extrapolation recorded BEFORE the full compile) must be exercised by
    the --tiny CPU self-test path end-to-end: heartbeat on stderr, final
    JSON on stdout."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # SERIALIZE_ESTIMATE: hold the full compile until the estimate branch
    # has run — without it, a fast tiny full-program compile can win the
    # race and legitimately skip the estimate (a flake, not a bug)
    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_EARLY_ESTIMATE="1",
               BENCH_TEST_SERIALIZE_ESTIMATE="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--tiny",
         "--skip-baseline", "--num-mc", "4", "--iters", "1"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    # match the SUCCESS heartbeat specifically: the bench deliberately
    # swallows estimate failures ('early estimate failed (ignored)'), and
    # a substring match on 'early estimate' would pass on that path too
    assert "early estimate: >=" in proc.stderr, proc.stderr[-2000:]
    assert "early estimate failed" not in proc.stderr
    payload = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1])
    assert payload["metric"].endswith("_tinyselftest")
    assert payload["value"] > 0


def test_hub_offline_env_parsing(monkeypatch):
    """HF_HUB_OFFLINE must be parsed with huggingface_hub's semantics:
    '0'/'false'/'' mean ONLINE. A raw truthiness test would treat the
    string '0' as offline and skip the reachability fast-fail probe."""
    from multimodal_auv_tpu.interop import hub

    for v, want in [("1", True), ("ON", True), ("yes", True),
                    ("true", True), ("0", False), ("false", False),
                    ("no", False), ("", False)]:
        monkeypatch.setenv("HF_HUB_OFFLINE", v)
        assert hub._env_offline() is want, v
    monkeypatch.delenv("HF_HUB_OFFLINE")
    assert hub._env_offline() is False


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """Production entry points (cli.py, serve_http.py) enable JAX's
    persistent compilation cache so restarted processes skip the 20-40 s
    cold compile. Pin: env-var resolution, off-switch, and that a jitted
    program actually populates the directory."""
    from multimodal_auv_tpu.utils.devices import enable_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        # off-switch
        monkeypatch.setenv("MULTIMODAL_AUV_COMPILE_CACHE", "off")
        assert enable_compilation_cache() is None

        # env-var dir wins over the default; cache fills on first compile
        d = tmp_path / "cc"
        monkeypatch.setenv("MULTIMODAL_AUV_COMPILE_CACHE", str(d))
        got = enable_compilation_cache()
        assert got == str(d) and os.path.isdir(got)
        # unique shapes so this program can't be an in-memory cache hit
        x = np.arange(173., dtype=np.float32)
        jax.jit(lambda a: (a * 2 + 1).sum())(x).block_until_ready()
        assert os.listdir(got), "compilation cache not written"

        # explicit argument beats the env var
        d2 = tmp_path / "cc2"
        assert enable_compilation_cache(str(d2)) == str(d2)
    finally:
        from jax.experimental.compilation_cache import compilation_cache

        jax.config.update("jax_compilation_cache_dir", prev)
        compilation_cache.reset_cache()  # drop the tmp-dir-pinned backend
