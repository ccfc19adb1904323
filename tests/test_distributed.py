"""Multi-host smoke test: a REAL 2-process jax.distributed CPU job.

Covers parallel/distributed.py end to end: initialize (coordinator bootstrap),
global_mesh over both processes' devices, host_local_to_global batch assembly,
and one DataParallel train step whose gradient psum crosses the process
boundary via gloo collectives. The subprocesses strip the axon TPU plugin's
site dir from PYTHONPATH (its sitecustomize imports jax at interpreter
startup, which freezes the platform before test code can choose CPU).
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


def test_two_process_distributed_dp_step():
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo_root, "tests", "_distributed_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    # keep our package importable, drop the axon site dir (see module docstring)
    env["PYTHONPATH"] = repo_root
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 local device per process

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=repo_root, text=True,
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
            raise
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "DIST_OK" in out, out

    # both processes must see the SAME (replicated) loss
    losses = sorted(
        line.split("loss=")[1]
        for out in outs
        for line in out.splitlines()
        if "DIST_OK" in line
    )
    assert len(losses) == 2 and losses[0] == losses[1], losses
