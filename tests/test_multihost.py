"""Multi-host (multi-process) distributed registration, simulated on CPU.

Launches two OS processes, each contributing 4 virtual CPU devices to one
``jax.distributed`` cluster (8-device global mesh), and runs the sharded
batched converge across the process boundary — the DCN-analogue path of the
real multi-host deployment.  Asserts both workers agree on the result and
match the known ground truth.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_converge():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", coordinator],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"RESULT {pid} OK" in out, out
