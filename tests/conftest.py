"""Test configuration.

Forces JAX onto the host CPU backend with 8 virtual devices so that all
mesh / pjit / sharding tests run without TPU hardware (the idiomatic JAX
replacement for the reference's mocked-``torch.cuda.device_count`` tests,
see /root/reference/unittests/test_utils.py:56-73).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

# Zero-egress test environment: without this, every pipeline test that
# reaches hub.fetch_pretrained_weights sits in huggingface_hub's HTTP
# connect+backoff for ~10-20 s before falling back — measured as ~half of
# test_pipelines' wall time (all threads idle). HF_HUB_OFFLINE makes the
# fallback immediate; production behavior (download when the network
# allows) is unchanged.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# NOTE on collective timeouts: on a 1-core host the 8 virtual devices
# timeshare one CPU, and XLA:CPU's collective-rendezvous terminate timeout
# can abort the process at flagship geometry. The debug options
# (xla_cpu_collective_call_{warn_stuck,terminate_timeout}_seconds) are NOT
# registered XLA_FLAGS in this jaxlib (setting them here fatals at flag
# parse) — they must go through jit .compile(compiler_options=...), which
# tests/test_flagship.py does for the only big-collective executions.

# Make the repo importable without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin force-registers itself in jax.config at import time,
# overriding JAX_PLATFORMS; pin the config back to CPU after import so tests
# never touch the (single, shared) real TPU chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: re-jitting the tiny models dominated the
# suite's wall time (~18 min cold); cached compiles cut repeat runs to a
# fraction. Safe to share with the TPU cache dir (entries are keyed by
# platform + HLO).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run @pytest.mark.slow tests (multi-process train steps, "
             "SIGTERM preemption, e2e pipelines, flagship-geometry compiles)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (minutes; multi-process / full-geometry / "
        "e2e). Excluded from the default gate; enable with --runslow.")


def pytest_collection_modifyitems(config, items):
    # Fast/slow split (round-3 verdict #8): `pytest -q` is the sub-5-minute
    # default gate; `pytest --runslow -q` is the full suite. The reference's
    # suite was fast because it mocked everything (SURVEY.md §4) — ours keeps
    # a fast core gate while the heavy integration tests remain one flag away.
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng_seed():
    return 0
