"""Multi-process SPMD test: 2 JAX processes over the distributed runtime.

CPU stand-in for multi-host DCN training — validates initialize_multihost,
the global mesh over non-addressable devices, and shard_batch's
``make_array_from_process_local_data`` path (reference equivalent:
DistributedSampler + DDP process groups, utils/commons.py:84-93).

Marked slow-ish: spawns two fresh python processes that each compile the
tiny train step.
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


@pytest.mark.timeout(600)
def test_two_process_train_step():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process; no virtual mesh
    env["PYTHONPATH"] = repo

    procs = [subprocess.Popen([sys.executable, worker, str(port), str(pid), "2"],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, cwd=repo, env=env)
             for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert line, out[-2000:]
        losses.append(float(line[0].split("loss=")[1].split()[0]))
    # replicated state => both processes report the identical global loss
    assert losses[0] == pytest.approx(losses[1], rel=1e-6), losses
