"""Multi-process jax.distributed smoke test (SURVEY.md §4 #4, BASELINE config 5).

Launches 2 localhost processes x 4 virtual CPU devices each, joined into one
8-device global mesh via dist.mesh.initialize_distributed, and drives the
sharded registration / PGO / SLAC paths with cross-process collectives.
This is the executed multi-host path the reference never had (its 'cluster'
was independent jobs on a shared filesystem — SURVEY.md §5).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).resolve().parent / "multiproc_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_smoke():
    port = _free_port()
    nprocs = 2
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(k), str(nprocs), str(port)],
            cwd=str(REPO),
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for k in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()  # exact PIDs we started — never pattern-kill
        for p in procs:
            p.wait()
        pytest.fail("multi-process workers timed out:\n" + "\n".join(outs))
    for k, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {k} failed (rc={p.returncode}):\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, f"worker {k} missing OK marker:\n{out[-4000:]}"
