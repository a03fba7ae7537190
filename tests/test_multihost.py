"""Multi-host scaffolding: a hermetic 2-process × 4-device CPU Gloo cluster
running distributed_solve across process boundaries (SURVEY.md §5
"Distributed communication backend" — the jax.distributed / DCN half).

The cluster is spawned as real OS processes (tests/_multihost_worker.py);
this is the closest CI-runnable analog of a 2-host pod: collectives
genuinely cross process memory spaces, arrays are only partially addressable
per process, and the final solution requires a cross-process all-gather.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster_solves():
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    # the workers configure platform/devices themselves before backend init
    env.pop("XLA_FLAGS", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(root, "tests", "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(nproc), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=root,
            env=env,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: OK" in out, out
