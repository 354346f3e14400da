"""Multi-host skeleton test: 2 processes x 4 virtual CPU devices joined by
jax.distributed into one 8-device mesh (SURVEY.md §5 distributed-backend
item; the reference is single-host only, 1_9_7File.pb:55-106)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_solve():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env = os.environ.copy()
    # drop the axon site hook (it would pre-initialize the TPU backend,
    # which breaks jax.distributed.initialize ordering)
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo] + pp)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"127.0.0.1:{port}", "2", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "found 0x20c350" in out, out[-1500:]
