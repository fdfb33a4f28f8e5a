"""True multi-PROCESS distributed test — the DDP-analogue evidence.

Spawns two real OS processes, each owning 4 virtual CPU devices, that
rendezvous via jax.distributed (parallel/distributed.py), build the same
8-device global mesh, feed per-host shards through host_shard_indices +
make_global_batch, and run one jitted global reduction. The single-process
virtual-device tests (test_parallel.py) validate SPMD semantics; this one
validates the *process* layer: coordinator rendezvous, process-local data
feeding, and a cross-process collective.

Reference axis: SURVEY.md §2.8 (the reference's dormant DDP branches,
train/multimodal.py:109-110)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["AUV_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from multimodal_auv_tpu.parallel.distributed import (
    host_shard_indices, initialize_distributed, make_global_batch)

pid = int(sys.argv[1])
initialize_distributed(os.environ["AUV_COORD"], 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

from jax.sharding import Mesh
mesh = Mesh(np.asarray(jax.devices()).reshape(8,), ("data",))

# global dataset: 11 samples (ragged split across hosts), value = index
n = 11
idx = host_shard_indices(n)
local = np.asarray(idx, np.float32).reshape(-1, 1) * np.ones((1, 3), np.float32)
# pad the local shard to a per-host quota that's a multiple of the local
# device count, so the global batch divides evenly over the 8-way 'data'
# axis (exactly what engine loops' padded-batch machinery guarantees)
per = -(-n // 2)
per = -(-per // jax.local_device_count()) * jax.local_device_count()
if local.shape[0] < per:
    pad = per - local.shape[0]
    local = np.concatenate([local, np.zeros((pad, 3), np.float32)])
(gx,) = make_global_batch(mesh, [local])
assert gx.shape == (2 * per, 3), gx.shape

@jax.jit
def global_sum(x):
    return x.sum()

total = float(global_sum(gx))
expect = float(sum(range(n)) * 3)  # zeros padding contributes 0
assert abs(total - expect) < 1e-4, (total, expect)
print(f"proc {pid}: global_sum={total} expect={expect} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_batch_and_collective(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "AUV_REPO": REPO,
        "AUV_COORD": f"localhost:{_free_port()}",
    })
    procs = [subprocess.Popen([sys.executable, str(worker), str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} rc={p.returncode}:\n{out[-3000:]}"
        assert "OK" in out, out[-1000:]


# NOTE: a heavier variant running the full pjit train step across the two
# processes was implemented and passed once (losses bitwise-equal), but on
# this single-CPU host the two processes compile serially and Gloo's
# collective-context rendezvous has a fixed ~30 s deadline — compile skew
# makes it flaky-to-hanging (one proc dies on DEADLINE_EXCEEDED, the peer
# blocks at the collective). The SPMD correctness of the sharded train
# step itself is covered deterministically by test_parallel.py and
# __graft_entry__.dryrun_multichip on virtual devices; this file pins the
# *process* layer (rendezvous, per-host feeding, cross-process collective)
# with the small program above, which compiles fast enough to stay inside
# the deadline.
