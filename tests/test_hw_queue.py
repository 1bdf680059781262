"""Shell-level tests for the hardware measurement queue's state machine.

tools/hw_round4.sh is the mechanism that lands the round's hardware record
the moment the TPU lease recovers — unattended, possibly across repeated
lease deaths. These tests drive its abort / resume / retry-once logic with
a stub ``python`` on PATH (no jax, no chip), exactly the failure modes the
wedged-lease outages of rounds 3-4 produced:

  * lease wedged before a step  -> abort, resume pointer at that step
  * step killed by timeout      -> queued for ONE retry, abort to re-probe
  * same step times out again   -> record rc=124 and move on (no loop)
  * healthy queue               -> runs to the end, writes the record file

No jax import, no TPU touch: pure subprocess + filesystem assertions.
"""

from __future__ import annotations

import os
import stat
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "tools" / "hw_round4.sh"


def _write_stub_python(tmp_path: Path, body: str) -> Path:
    """Create a stub `python` on PATH. `body` sees the args as "$@"."""
    bindir = tmp_path / "bin"
    bindir.mkdir(exist_ok=True)
    stub = bindir / "python"
    stub.write_text("#!/bin/bash\n" + body + "\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    return bindir


def _run_queue(tmp_path: Path, bindir: Path, start: int = 0, **extra_env):
    log = tmp_path / "log"
    dest = tmp_path / "records"
    env = dict(
        os.environ,
        PATH=f"{bindir}:{os.environ['PATH']}",
        HW_LOG_DIR=str(log),
        HW_RECORDS_DIR=str(dest),
        HW_STEP_TIMEOUT="30",
        HW_PROBE_TIMEOUT="10",
        **{k: str(v) for k, v in extra_env.items()},
    )
    proc = subprocess.run(
        ["bash", str(SCRIPT), str(start)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120,
    )
    return proc, log, dest


def _resume_step(log: Path) -> int:
    return int((log / ".resume_step").read_text())


def test_healthy_queue_runs_to_completion(tmp_path):
    bindir = _write_stub_python(tmp_path, 'echo \'{"metric": "stub"}\'; exit 0')
    proc, log, dest = _run_queue(tmp_path, bindir)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "ALL DONE" in proc.stdout
    # every step produced a log and the condensed record file exists
    logs = list(log.glob("*.log"))
    assert len(logs) >= 15  # parity checks + benches + traces + A/Bs + smoke
    records = (dest / "r4_records.txt").read_text()
    for name in ("fused_check", "bench", "prof_glow", "lm_batch64", "train_smoke"):
        assert f"== {name}" in records, name
    # the resume pointer ends past the last step (idempotent re-entry)
    assert _resume_step(log) > len(logs)


def test_wedged_probe_aborts_with_resume_pointer(tmp_path):
    # probe (the jnp.ones one-liner) hangs/fails; steps would succeed
    bindir = _write_stub_python(
        tmp_path, 'case "$*" in *"jnp.ones"*) exit 1 ;; *) exit 0 ;; esac')
    proc, log, _ = _run_queue(tmp_path, bindir)
    assert proc.returncode == 1
    assert "LEASE WEDGED" in proc.stdout
    assert _resume_step(log) == 1  # first step never ran; resume from it
    assert not list(log.glob("*.log"))


def test_mid_queue_wedge_resumes_where_it_left_off(tmp_path):
    # healthy, run a prefix; then wedge; then resume from the pointer
    flag = tmp_path / "wedged"
    body = (
        f'case "$*" in *"jnp.ones"*) [ -e {flag} ] && exit 1 || exit 0 ;; '
        '*"tools.enc_check"*) touch ' + str(flag) + '; exit 0 ;; *) exit 0 ;; esac'
    )
    bindir = _write_stub_python(tmp_path, body)
    proc, log, _ = _run_queue(tmp_path, bindir)
    assert proc.returncode == 1
    # enc_check is step 3; it ran, then the probe before step 4 failed
    assert (log / "enc_check.log").exists()
    assert not (log / "attn_check.log").exists()
    resume = _resume_step(log)
    assert resume == 4
    # second recovery: lease healthy again -> queue completes from step 4
    flag.unlink()
    proc2, log2, _ = _run_queue(tmp_path, bindir, start=resume)
    assert proc2.returncode == 0
    assert "[3] skip enc_check" in proc2.stdout  # prefix not re-run
    assert (log2 / "attn_check.log").exists()


def test_step_timeout_retries_exactly_once(tmp_path):
    # wn_check (step 2) exits 124 — indistinguishable from `timeout` killing
    # it, the signature of a lease that wedged DURING the step
    bindir = _write_stub_python(
        tmp_path, 'case "$*" in *"tools.wn_check"*) exit 124 ;; *) exit 0 ;; esac')
    proc, log, _ = _run_queue(tmp_path, bindir)
    assert proc.returncode == 1
    assert "queued for ONE retry" in proc.stdout
    assert _resume_step(log) == 2
    assert (log / ".retried_2").exists()
    # retry attempt: still 124 -> recorded and the queue MOVES ON (no loop)
    proc2, log2, _ = _run_queue(tmp_path, bindir, start=2)
    assert proc2.returncode == 0
    assert "wn_check rc=124" in proc2.stdout
    assert "queued for ONE retry" not in proc2.stdout
    assert (log2 / "enc_check.log").exists()  # queue continued past it
