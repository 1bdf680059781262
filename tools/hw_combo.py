"""One-process hardware measurement combo.

Why: on this image the TPU lease recovers in SHORT windows (observed
02:55-03:02 UTC Aug 19: one healthy window ran exactly one queue step,
then the lease wedged again).  Each queue step as a separate python
process pays ~60-90 s of backend init plus a teardown that has preceded
two of the observed wedges — so a window that could fit five measurements
lands one.  This runner executes many queue stages inside ONE python
process: backend init is paid once, the lease is held continuously, and
every stage appends its own ``<name>.log`` under ``benchmarks/hw_logs/r4``
exactly where the shell queue's per-step logs would have gone.

Contract with tools/hw_round5.sh:
  * exit 0  — every stage attempted (individual stages may still have
    failed; their logs record the traceback, and FAILED lines appear in
    the queue log).
  * exit 3  — the in-process one-op probe before a stage hung: the lease
    wedged mid-combo.  The shell queue treats this like a wedge (abort,
    resume this step on the next recovery); the combo's own resume file
    (``.combo_resume_<group>``) skips stages that already ran.
  * exit 4  — the deadline passed with stages still unlaunched.  The shell
    queue must KEEP its resume pointer at this step (r4 advisor finding:
    exiting 0 here advanced the pointer and silently skipped the remaining
    stages on every later resume).
  * a hang (lease death inside a stage's compile) is bounded by the
    per-stage watchdog, which also exits 3 — by then the client is already
    wedged, so the hard exit cannot sacrifice a healthy lease (CLAUDE.md
    probe-recovery pattern).

Stages are driven via ``runpy.run_module(..., run_name="__main__")`` with
``sys.argv`` patched — the same CLI surface the subprocess queue used, no
tool refactors, and call-time env knobs (GLOW_FUSED=0 etc.) work as a
per-stage ``env`` dict.  After every stage the default PRNG impl is
restored to threefry2x32 so stage order cannot leak state (train benches
select rbg themselves; sampling relies on the process default).
"""

from __future__ import annotations

import json
import os
import runpy
import sys
import threading
import time
import traceback

LOG_DIR = os.environ.get("HW_LOG_DIR", "benchmarks/hw_logs/r5")
STATUS_FILE = os.environ.get("HW_STATUS_FILE", "benchmarks/hw_logs/STATUS.md")
STAGE_BUDGET = float(os.environ.get("HW_COMBO_STAGE_TIMEOUT", "2400"))
# Post-process lease handover has stalled a new client's first op for
# 5-15 min on this image (observed 22:00-23:00 UTC Aug 19) before completing
# normally. Riding the stall out inside THIS process is strictly better than
# exit-3 + watcher-cycle (teardown risks re-wedging; the retry costs ~15 min
# anyway), so the probe waits up to 900 s; only a genuinely dead lease pays
# the full wait.
PROBE_TIMEOUT = float(os.environ.get("HW_COMBO_PROBE_TIMEOUT", "900"))

# fd 1 as it was at entry: stage stdout/stderr get redirected to the stage
# log at the fd level (captures XLA/absl C-level output too), status lines
# go here so the queue log stays readable.
_REAL_OUT = os.dup(1)


def say(msg: str) -> None:
    os.write(_REAL_OUT, (msg + "\n").encode())


def status_line(name: str, ok: bool, dur: float, logpath: str) -> None:
    """Append one PASS/FAIL line (with the failing assertion, if any) to the
    committed status file — r4's two failed hardware checks were invisible
    to the next session because nothing surfaced them outside the logs."""
    detail = ""
    if not ok:
        try:
            lines = [l.strip() for l in open(logpath, errors="replace")
                     if l.strip()]
            err = next((l for l in reversed(lines)
                        if "Error" in l or "assert" in l.lower()), "")
            detail = f" — `{err[:200]}`" if err else ""
        except OSError:
            pass
    stamp = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    try:
        with open(STATUS_FILE, "a") as f:
            f.write(f"- {stamp} **{name}** {'PASS' if ok else 'FAIL'} "
                    f"({dur:.0f}s, {logpath}){detail}\n")
    except OSError:
        pass


_last_progress = [time.time()]


def _stage_watchdog() -> None:
    """Bound a mid-stage lease death. A healthy stage always finishes inside
    STAGE_BUDGET (the old per-step shell timeout); exceeding it means the
    client is hung on a dead lease, where a hard exit is safe."""
    while True:
        time.sleep(30)
        if time.time() - _last_progress[0] > STAGE_BUDGET:
            say(f"COMBO WATCHDOG: stage exceeded {STAGE_BUDGET:.0f}s — "
                "lease presumed wedged, exit 3")
            os._exit(3)


def _probe() -> None:
    """One tiny op with a hang watchdog before each stage (rc=3 on wedge)."""
    done = threading.Event()

    def watchdog():
        if not done.wait(PROBE_TIMEOUT):
            say(f"COMBO PROBE hung > {PROBE_TIMEOUT:.0f}s — lease wedged, exit 3")
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    try:
        import jax
        import jax.numpy as jnp

        jax.device_get(jnp.ones((8, 8)).sum())
    except Exception as e:
        done.set()
        say(f"COMBO PROBE failed: {type(e).__name__}: {e} — exit 3")
        sys.exit(3)
    done.set()


def _restore_prng_default() -> None:
    import jax

    try:
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    except Exception:
        pass


def run_stage(idx: int, name: str, module: str, argv: list[str],
              env: dict[str, str] | None = None) -> bool:
    _last_progress[0] = time.time()
    _probe()
    logpath = os.path.join(LOG_DIR, name + ".log")
    saved_env = {k: os.environ.get(k) for k in (env or {})}
    os.environ.update(env or {})
    saved_argv = sys.argv
    sys.argv = [module] + argv
    saved_err = os.dup(2)
    t0 = time.time()
    ok = True
    logf = open(logpath, "w")
    # redirect BOTH the fds (XLA/absl C-level output) and the Python-level
    # stream objects (sys.stdout may not be fd 1, e.g. under pytest capture)
    os.dup2(logf.fileno(), 1)
    os.dup2(logf.fileno(), 2)
    saved_stdout, saved_stderr = sys.stdout, sys.stderr
    sys.stdout = sys.stderr = logf
    try:
        runpy.run_module(module, run_name="__main__")
    except SystemExit as e:
        ok = e.code in (0, None)
    except BaseException:
        traceback.print_exc(file=logf)
        ok = False
    finally:
        sys.stdout, sys.stderr = saved_stdout, saved_stderr
        os.dup2(_REAL_OUT, 1)
        os.dup2(saved_err, 2)
        os.close(saved_err)
        logf.close()
        sys.argv = saved_argv
        for k, v in saved_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        _restore_prng_default()
    say(f"[combo {idx}] {name} {'ok' if ok else 'FAILED'} "
        f"({time.time() - t0:.0f}s, {logpath})")
    status_line(name, ok, time.time() - t0, logpath)
    _last_progress[0] = time.time()
    return ok


RB = "benchmarks.run_benchmarks"

GROUPS: dict[str, list[tuple]] = {
    # (name, module, argv, env) — ordered by value within each group
    "checks": [
        ("wn_check", "tools.wn_check", [], None),
        ("enc_check", "tools.enc_check", [], None),
        ("fused_check", "tools.fused_check", [], None),
        ("attn_check", "tools.attn_check", [], None),
        ("flash_check", "tools.flash_check", [], None),
    ],
    "rest": [
        # default aux suite, per metric (each merges into results.json)
        ("bench_lm_samp", RB, ["--only", "lm"], None),
        ("bench_glow_rtf", RB, ["--only", "glow"], None),
        # full text->waveform RTF vs the BASELINE <0.05 target (r4 next #5)
        ("bench_e2e_rtf", RB, ["--only", "e2e_rtf"], None),
        ("bench_glow_tr", RB, ["--only", "glow_train"], None),
        ("bench_mas", RB, ["--only", "mas"], None),
        ("bench_vqtts_tr", RB, ["--only", "vqtts_train"], None),
        ("bench_lm_tr", RB, ["--only", "lm_train"], None),
        # device traces for the MFU decomposition
        ("prof_glow", "tools.perf_profile", ["--model", "glow"], None),
        ("prof_vqtts", "tools.perf_profile", ["--model", "vqtts"], None),
        ("prof_lm", "tools.perf_profile", ["--model", "lm"], None),
        # dispatch-latency decomposition
        ("disp_lm", "tools.dispatch_probe", ["--model", "lm"], None),
        ("disp_glow", "tools.dispatch_probe", ["--model", "glow"], None),
        ("disp_vqtts", "tools.dispatch_probe", ["--model", "vqtts"], None),
        # A/B variants (--no-save: results.json only ever holds defaults)
        ("glow_condonly", RB, ["--only", "glow_train", "--no-save"],
         {"GLOW_FLOW_STEP": "0"}),
        ("glow_noenc", RB, ["--only", "glow_train", "--no-save"],
         {"GLOW_ENC": "0"}),
        ("vqtts_noenc", RB, ["--only", "vqtts_train", "--no-save"],
         {"VQTTS_ENC": "0"}),
        ("glow_unfused", RB, ["--only", "glow_train", "--no-save"],
         {"GLOW_FUSED": "0"}),
        ("vqtts_unfused", RB, ["--only", "vqtts_train", "--no-save"],
         {"VQTTS_FUSED": "0"}),
        ("lm_unfused", RB, ["--only", "lm_train", "--no-save"],
         {"LM_FUSED": "0"}),
        ("lm_batch64", RB, ["--only", "lm_train", "--no-save"],
         {"LM_BATCH": "64"}),
        ("lm_spd8", RB, ["--only", "lm_train", "--no-save"],
         {"LM_SPD": "8"}),
        # steps_per_dispatch on the other small-step models: the round-2
        # Glow trace showed ~30% of wall in scheduling/dispatch gaps
        ("glow_spd8", RB, ["--only", "glow_train", "--no-save"],
         {"GLOW_SPD": "8"}),
        ("vqtts_spd8", RB, ["--only", "vqtts_train", "--no-save"],
         {"VQTTS_SPD": "8"}),
    ],
}


def main() -> None:
    group = sys.argv[1] if len(sys.argv) > 1 else "rest"
    stages = GROUPS[group]
    os.makedirs(LOG_DIR, exist_ok=True)
    resume_file = os.path.join(LOG_DIR, f".combo_resume_{group}")
    try:
        resume = int(open(resume_file).read())
    except (OSError, ValueError):
        resume = 0
    threading.Thread(target=_stage_watchdog, daemon=True).start()
    failed = []
    launched = 0
    deadline_break = False
    for idx, (name, module, argv, env) in enumerate(stages):
        if idx < resume:
            say(f"[combo {idx}] skip {name} (already ran)")
            continue
        # deadline guard (tools/tpu_watcher.sh): never LAUNCH a stage past
        # it — the driver's round-end bench.py needs the lease to itself.
        # Exit 4 (distinct from success): completed stages' logs stand, the
        # shell queue keeps its pointer HERE, and .combo_resume picks up at
        # this stage on the next recovery (r4 advisor finding: exiting 0
        # advanced the shell pointer past the unfinished combo).
        try:
            deadline = float(open(os.path.join(LOG_DIR, ".deadline")).read())
        except (OSError, ValueError):
            deadline = None
        # Launch margin: a stage launched just before the deadline can hold
        # the lease up to STAGE_BUDGET past it (r4 advisor finding). 600 s
        # covers a typical stage; a stage that still overruns is hung on a
        # dead lease (watchdog exit 3), where the driver's bench would have
        # skipped anyway.
        margin = float(os.environ.get("HW_COMBO_DEADLINE_MARGIN", "600"))
        if deadline is not None and time.time() + margin >= deadline:
            say(f"[combo {idx}] DEADLINE margin — stopping before {name}")
            deadline_break = True
            break
        launched += 1
        if not run_stage(idx, name, module, argv, env):
            failed.append(name)
        with open(resume_file, "w") as f:
            f.write(str(idx + 1))
    say(f"combo {group} DONE — {launched - len(failed)} ok of {launched} "
        f"launched ({len(stages)} total), {len(failed)} failed"
        f"{': ' + ', '.join(failed) if failed else ''}")
    summary = {"combo": group, "failed": failed, "launched": launched,
               "stages": [s[0] for s in stages]}
    say(json.dumps(summary))
    if deadline_break:
        sys.exit(4)


if __name__ == "__main__":
    main()
