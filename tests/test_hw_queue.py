"""Shell-level tests for the hardware measurement queue's state machine.

tools/hw_round5.sh is the mechanism that lands the round's hardware record
the moment the TPU lease recovers — unattended, possibly across repeated
lease deaths. These tests drive its abort / resume / retry-once logic with
a stub ``python`` on PATH (no jax, no chip), exactly the failure modes the
wedged-lease outages of rounds 3-4 produced:

  * lease wedged before a step  -> abort, resume pointer at that step
  * step killed by timeout      -> queued for ONE retry, abort to re-probe
  * same step times out again   -> record rc=124 and move on (no loop)
  * a combo step exits 3        -> wedge mid-combo: abort, resume AT it
  * a combo step exits 4        -> deadline break: pointer stays, exit 0
    (r4 advisor finding: exiting 0 with an advanced pointer silently
    skipped the remaining combo stages on every later resume)
  * deadline too close          -> step is NOT launched (a step started
    just before the deadline could hold the lease past it, colliding with
    the driver's round-end bench.py)
  * healthy queue               -> runs to the end, writes the record file

The queue's steps are: combo_checks, bench, combo_rest, train_smoke — the
combo steps batch many measurements into one python process
(tools/hw_combo) because lease-recovery windows are short; the combo's own
per-stage resume/failure machinery is tested in-process below with a fake
stage module (no jax, no TPU touch). Every outcome also lands a line in
the committed STATUS.md (VERDICT r4 next #6).
"""

from __future__ import annotations

import os
import stat
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "tools" / "hw_round5.sh"

STEPS = ["combo_checks", "bench", "train_smoke", "combo_rest"]


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
        HW_STATUS_FILE=str(tmp_path / "STATUS.md"),
        HW_STEP_TIMEOUT="30",
        HW_COMBO_TIMEOUT="30",
        HW_PROBE_TIMEOUT="10",
        HW_PROBE_TRIES="1",
        HW_PROBE_PAUSE="0",
    )
    env.update({k: str(v) for k, v in extra_env.items()})
    proc = subprocess.run(
        ["bash", str(SCRIPT), str(start)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120,
    )
    return proc, log, dest


def _resume_step(log: Path) -> int:
    return int((log / ".resume_step").read_text())


def _status(tmp_path: Path) -> str:
    p = tmp_path / "STATUS.md"
    return p.read_text() if p.exists() else ""


def test_healthy_queue_runs_to_completion(tmp_path):
    bindir = _write_stub_python(tmp_path, 'echo \'{"metric": "stub"}\'; exit 0')
    proc, log, dest = _run_queue(tmp_path, bindir)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "ALL DONE" in proc.stdout
    # every step produced a log and the condensed record file exists
    logs = {p.stem for p in log.glob("*.log")}
    assert logs == set(STEPS)
    records = (dest / "r5_records.txt").read_text()
    for name in STEPS:
        assert f"== {name}" in records, name
    # the resume pointer ends past the last step (idempotent re-entry)
    assert _resume_step(log) == len(STEPS) + 1
    # every step landed a PASS line in the status file
    status = _status(tmp_path)
    for name in STEPS:
        assert f"**{name}** PASS" in status, (name, status)


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
        '*"bench.py"*) touch ' + str(flag) + '; exit 0 ;; *) exit 0 ;; esac'
    )
    bindir = _write_stub_python(tmp_path, body)
    proc, log, _ = _run_queue(tmp_path, bindir)
    assert proc.returncode == 1
    # bench is step 2; it ran, then the probe before step 3 (train_smoke)
    # failed
    assert (log / "bench.log").exists()
    assert not (log / "train_smoke.log").exists()
    assert not (log / "combo_rest.log").exists()
    resume = _resume_step(log)
    assert resume == 3
    # second recovery: lease healthy again -> queue completes from step 3
    flag.unlink()
    proc2, log2, _ = _run_queue(tmp_path, bindir, start=resume)
    assert proc2.returncode == 0
    assert "[2] skip bench" in proc2.stdout  # prefix not re-run
    assert (log2 / "combo_rest.log").exists()


def test_transient_probe_failure_is_retried_not_fatal(tmp_path):
    # Right after a TPU process exits, the lease can take a minute to hand
    # over: the FIRST probe of a step fails, the retry succeeds. The queue
    # must ride through instead of aborting into a watcher cycle (observed
    # 03:03 UTC Aug 19: fused_check rc=0, next probe hung, queue aborted).
    count = tmp_path / "probe_count"
    body = (
        'case "$*" in *"jnp.ones"*) '
        f'n=$(cat {count} 2>/dev/null || echo 0); echo $((n+1)) > {count}; '
        # every 3rd probe call fails (first try of some steps), retries pass
        '[ $(( (n+1) % 3 )) -eq 0 ] && exit 1 || exit 0 ;; '
        "*) exit 0 ;; esac"
    )
    bindir = _write_stub_python(tmp_path, body)
    proc, log, dest = _run_queue(tmp_path, bindir, HW_PROBE_TRIES=2)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "LEASE WEDGED" not in proc.stdout
    assert (dest / "r5_records.txt").exists()


def test_step_timeout_retries_exactly_once(tmp_path):
    # combo_checks (step 1) exits 124 — indistinguishable from `timeout`
    # killing it, the signature of a lease that wedged DURING the step
    bindir = _write_stub_python(
        tmp_path,
        'case "$*" in *"tools.hw_combo checks"*) exit 124 ;; *) exit 0 ;; esac')
    proc, log, _ = _run_queue(tmp_path, bindir)
    assert proc.returncode == 1
    assert "queued for ONE retry" in proc.stdout
    assert _resume_step(log) == 1
    assert (log / ".retried_1").exists()
    assert "**combo_checks** TIMEOUT" in _status(tmp_path)
    # retry attempt: still 124 -> recorded and the queue MOVES ON (no loop)
    proc2, log2, _ = _run_queue(tmp_path, bindir, start=1)
    assert proc2.returncode == 0
    assert "combo_checks rc=124" in proc2.stdout
    assert "queued for ONE retry" not in proc2.stdout
    assert (log2 / "bench.log").exists()  # queue continued past it


def test_combo_wedge_signal_resumes_at_same_step(tmp_path):
    # rc=3 is tools/hw_combo's "lease wedged mid-combo" signal: the queue
    # must abort AND point resume at the SAME step (the combo's internal
    # .combo_resume_* file carries the fine-grained progress).
    flag = tmp_path / "wedged_once"
    body = (
        'case "$*" in *"tools.hw_combo rest"*) '
        f'[ -e {flag} ] && exit 0 || {{ touch {flag}; exit 3; }} ;; '
        "*) exit 0 ;; esac"
    )
    bindir = _write_stub_python(tmp_path, body)
    proc, log, _ = _run_queue(tmp_path, bindir)
    assert proc.returncode == 1
    assert "wedged lease (rc=3)" in proc.stdout
    assert _resume_step(log) == 4  # combo_rest is step 4; resume AT it
    assert not (log / ".retried_4").exists()
    # next recovery: combo healthy -> queue completes from the same step
    proc2, log2, _ = _run_queue(tmp_path, bindir, start=4)
    assert proc2.returncode == 0
    assert "ALL DONE" in proc2.stdout
    assert _resume_step(log2) == len(STEPS) + 1


def test_combo_deadline_break_keeps_pointer_and_exits_zero(tmp_path):
    # rc=4 is tools/hw_combo's "deadline passed, stages unlaunched" signal:
    # the queue must stop cleanly (exit 0 — intended behavior) but KEEP the
    # pointer at the combo step so the next queue run re-enters it.
    bindir = _write_stub_python(
        tmp_path,
        'case "$*" in *"tools.hw_combo rest"*) exit 4 ;; *) exit 0 ;; esac')
    proc, log, _ = _run_queue(tmp_path, bindir)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "deadline (rc=4)" in proc.stdout
    assert _resume_step(log) == 4  # combo_rest is step 4; resume AT it
    assert (log / "train_smoke.log").exists()  # earlier steps DID run
    assert "**combo_rest** DEFERRED" in _status(tmp_path)


def test_deadline_margin_blocks_launch(tmp_path):
    # A deadline less than STEP_TIMEOUT away must prevent LAUNCHING the next
    # step — not merely launching past the deadline (r4 advisor finding).
    # A float timestamp (time.time() writes those) must also parse.
    bindir = _write_stub_python(tmp_path, "exit 0")
    log = tmp_path / "log"
    log.mkdir(parents=True)
    (log / ".deadline").write_text(f"{time.time() + 15:.2f}")  # < STEP_TIMEOUT=30
    proc, log, _ = _run_queue(tmp_path, bindir)
    assert proc.returncode == 0
    assert "DEADLINE margin" in proc.stdout
    assert _resume_step(log) == 1  # nothing launched; resume from step 1
    assert not list(log.glob("*.log"))
    assert "DEFERRED" in _status(tmp_path)


def test_failed_step_lands_fail_line_in_status(tmp_path):
    bindir = _write_stub_python(
        tmp_path,
        'case "$*" in *"bench.py"*) echo "AssertionError: x mismatch" >&2; '
        "exit 1 ;; *) exit 0 ;; esac")
    proc, _, _ = _run_queue(tmp_path, bindir)
    assert proc.returncode == 0  # a FAILED step does not abort the queue
    status = _status(tmp_path)
    assert "**bench** FAIL" in status
    assert "AssertionError: x mismatch" in status


# ---------------------------------------------------------------------------
# tools/hw_combo in-process state machine (fake stage module, no jax ops)


@pytest.fixture()
def combo(tmp_path, monkeypatch):
    monkeypatch.syspath_prepend(str(REPO))
    monkeypatch.syspath_prepend(str(REPO / "tests"))
    from tools import hw_combo

    monkeypatch.setattr(hw_combo, "LOG_DIR", str(tmp_path))
    monkeypatch.setattr(hw_combo, "STATUS_FILE", str(tmp_path / "STATUS.md"))
    monkeypatch.setattr(hw_combo, "_probe", lambda: None)
    monkeypatch.setattr(hw_combo, "_restore_prng_default", lambda: None)
    return hw_combo


def test_combo_stage_isolation_and_resume(combo, tmp_path, monkeypatch):
    touched = tmp_path / "touched"
    stages = [
        ("s_ok", "_fake_combo_stage", ["--x"], {"FAKE_STAGE_TOUCH": str(touched)}),
        ("s_fail", "_fake_combo_stage", [], {"FAKE_STAGE_RC": "1"}),
        ("s_raise", "_fake_combo_stage", [], {"FAKE_STAGE_RAISE": "1"}),
        ("s_ok2", "_fake_combo_stage", [], None),
    ]
    monkeypatch.setitem(combo.GROUPS, "fake", stages)
    monkeypatch.setattr(sys, "argv", ["hw_combo", "fake"])
    combo.main()
    # every stage attempted despite failures in the middle; logs captured
    for name, *_ in stages:
        assert (tmp_path / f"{name}.log").exists(), name
    assert "argv=['--x']" in (tmp_path / "s_ok.log").read_text()
    assert "fake stage exploded" in (tmp_path / "s_raise.log").read_text()
    assert (tmp_path / ".combo_resume_fake").read_text() == "4"
    assert touched.read_text() == "x"
    # env overrides did not leak between stages
    assert "FAKE_STAGE_RC" not in os.environ
    assert "FAKE_STAGE_RAISE" not in os.environ
    # per-stage STATUS lines: PASS for the good ones, FAIL for the bad
    status = (tmp_path / "STATUS.md").read_text()
    assert "**s_ok** PASS" in status
    assert "**s_fail** FAIL" in status
    assert "**s_raise** FAIL" in status
    # re-entry: everything already ran -> all skipped, no double side effects
    combo.main()
    assert touched.read_text() == "x"


def test_combo_deadline_break_exits_4_and_resumes_at_stage(
        combo, tmp_path, monkeypatch):
    # The deadline passing mid-combo must exit 4 (NOT 0) with the combo
    # resume pointer at the first unlaunched stage, so the shell queue
    # re-enters the combo next recovery instead of skipping it forever.
    ran = tmp_path / "ran"
    stages = [
        ("d_ok", "_fake_combo_stage", [], {"FAKE_STAGE_TOUCH": str(ran)}),
        ("d_never", "_fake_combo_stage", [], None),
    ]
    monkeypatch.setitem(combo.GROUPS, "dfake", stages)
    monkeypatch.setattr(sys, "argv", ["hw_combo", "dfake"])

    # deadline in the past from the start -> nothing launches, exit 4
    (tmp_path / ".deadline").write_text(str(time.time() - 1))
    with pytest.raises(SystemExit) as exc:
        combo.main()
    assert exc.value.code == 4
    assert not ran.exists()
    resume = tmp_path / ".combo_resume_dfake"
    assert not resume.exists() or resume.read_text() == "0"

    # deadline in the future -> both stages run, exit normally (no raise)
    (tmp_path / ".deadline").write_text(str(time.time() + 3600))
    combo.main()
    assert ran.read_text() == "x"
    assert resume.read_text() == "2"


def test_combo_real_groups_reference_real_modules():
    # every stage in the shipped groups must point at an importable module
    # (a typo here would silently lose a measurement on the chip)
    import importlib.util

    from tools import hw_combo

    for group, stages in hw_combo.GROUPS.items():
        names = [s[0] for s in stages]
        assert len(names) == len(set(names)), f"duplicate stage names in {group}"
        for name, module, argv, env in stages:
            assert importlib.util.find_spec(module) is not None, (group, module)
