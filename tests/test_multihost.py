"""Two real jax.distributed processes on CPU — the multi-HOST code paths
(make_global_batch from process-local data, length_sync, barrier, 2-host
orbax checkpoint) that the 8-virtual-device single-process suite cannot
reach. Equivalent of the reference's intended WORLD_SIZE=2 distributed CI
(reference Makefile:9-15)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for pid, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=600)
        outs.append(out)
        assert proc.returncode == 0, f"pid {pid} failed:\n{out}"
    for pid, out in enumerate(outs):
        assert f"MULTIHOST-OK pid={pid}" in out, out
