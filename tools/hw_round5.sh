#!/bin/bash
# Round-5 hardware measurement queue (VERDICT r4 next #1-#3, #5-#7).
#
# Runs every queued parity check and benchmark sequentially on the real
# chip — ONE TPU process at a time, generous timeouts (first compiles on
# this 1-core host can take minutes; timeout SIGTERM during a long compile
# has wedged the remote lease, so budgets are >= 1500 s).
#
# ORDERED BY VALUE: (1) the r4-red kernel parity contracts (wn_check VMEM
# OOM fix + enc_check protocol fix), (2) the headline bench, (3) the
# default-config results.json of record + the deferred r4 measurement
# stages, then the train smoke. A/B variant runs use --no-save so
# results.json only ever holds the shipped default configuration.
#
# Every step appends a PASS/FAIL line to benchmarks/hw_logs/STATUS.md
# (VERDICT r4 next #6) — read that file FIRST next session.
#
# Usage: bash tools/hw_round5.sh [start_step]   # logs to benchmarks/hw_logs/r5/
set -u
cd "$(dirname "$0")/.."
# Logs + resume pointer live IN THE REPO, not /tmp: a session/VM restart
# wipes /tmp, which would lose both the evidence of a partially-run queue
# and the step to resume from. HW_* env overrides exist so
# tests/test_hw_queue.py can drive the abort/resume/retry state machine
# with a stub python and a tmp log dir.
LOG="${HW_LOG_DIR:-benchmarks/hw_logs/r5}"
DEST="${HW_RECORDS_DIR:-benchmarks/hw_logs}"
STATUS="${HW_STATUS_FILE:-benchmarks/hw_logs/STATUS.md}"
STEP_TIMEOUT="${HW_STEP_TIMEOUT:-2400}"
# Probe timeout rides out the 5-15 min post-process handover stalls observed
# on this image (a first op that completes normally after several minutes):
# 2 tries x 420 s + pause covers ~15 min before declaring the lease dead.
PROBE_TIMEOUT="${HW_PROBE_TIMEOUT:-420}"
mkdir -p "$LOG"
START=${1:-0}
N=0

status_line() {  # status_line <name> <PASS|FAIL|...> <extra>
    echo "- $(date -u +%FT%TZ) **$1** $2 $3" >> "$STATUS"
}

probe() {
    # Right after a TPU process exits, the remote lease can take a minute+
    # to hand over — a single failed one-op probe there is NOT a wedge.
    # Retry a few times with a pause before declaring the lease dead.
    local tries="${HW_PROBE_TRIES:-2}"
    for _ in $(seq 1 "$tries"); do
        timeout "$PROBE_TIMEOUT" python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" \
            > /dev/null 2>&1 && return 0
        sleep "${HW_PROBE_PAUSE:-60}"
    done
    return 1
}

deadline() {  # integer unix timestamp or empty; tolerate float contents
    local d
    d=$(cat "$LOG/.deadline" 2>/dev/null || true)
    echo "${d%%.*}"
}

run() {
    local t="$STEP_TIMEOUT"
    if [ "$1" = "-t" ]; then t="$2"; shift 2; fi
    local name=$1; shift
    N=$((N + 1))
    [ "$N" -lt "$START" ] && { echo "[$N] skip $name"; return; }
    # Deadline guard (see tools/tpu_watcher.sh): only launch a step that can
    # FINISH by the deadline — a step launched just before it could hold the
    # lease up to STEP_TIMEOUT past it, colliding with the driver's
    # round-end bench.py (r4 advisor finding). The margin is STEP_TIMEOUT
    # even for the long-budget combo step: the combo re-checks the deadline
    # internally before each ~STEP_TIMEOUT-bounded stage.
    local d
    d=$(deadline)
    if [ -n "$d" ] && [ "$(($(date +%s) + STEP_TIMEOUT))" -ge "$d" ]; then
        echo "[$N] DEADLINE margin — stopping before $name (resume: bash tools/hw_round5.sh $N)"
        echo "$N" > "$LOG/.resume_step"
        status_line "$name" "DEFERRED" "(deadline margin; queue resumes at step $N)"
        exit 0
    fi
    if ! probe; then
        echo "[$N] LEASE WEDGED before $name — aborting queue (resume: bash tools/hw_round5.sh $N)"
        echo "$N" > "$LOG/.resume_step"   # watcher auto-resumes from here
        exit 1
    fi
    echo "[$N] $name: $*"
    local t0=$SECONDS
    timeout "$t" "$@" > "$LOG/$name.log" 2>&1
    local rc=$?
    echo "[$N] $name rc=$rc (${LOG}/$name.log, $((SECONDS - t0))s)"
    if [ "$rc" -eq 3 ]; then
        # tools/hw_combo's wedge signal: the lease died mid-step. The combo
        # makes internal per-stage progress (.combo_resume_*), so re-running
        # this step on every recovery converges — resume HERE, not past it.
        echo "$N" > "$LOG/.resume_step"
        echo "[$N] $name reported a wedged lease (rc=3) — aborting to re-probe"
        status_line "$name" "WEDGED" "(rc=3, $((SECONDS - t0))s; resumes at step $N)"
        exit 1
    fi
    if [ "$rc" -eq 4 ]; then
        # tools/hw_combo's deadline signal: stages remain unlaunched. Keep
        # the pointer HERE so the next queue run re-enters the combo (its
        # own .combo_resume_* skips the finished stages); exit 0 — stopping
        # at the deadline is the intended behavior, not a failure.
        echo "$N" > "$LOG/.resume_step"
        echo "[$N] $name stopped at the deadline (rc=4) — combo resumes at its next stage"
        status_line "$name" "DEFERRED" "(combo deadline break; resumes at step $N)"
        exit 0
    fi
    if [ "$rc" -eq 124 ] && [ ! -e "$LOG/.retried_$N" ]; then
        # timeout usually means the lease wedged DURING the step — retry it
        # once on the next watcher recovery instead of skipping its record
        # (but only once: a step that wedges the lease every time must not
        # loop forever)
        touch "$LOG/.retried_$N"
        echo "$N" > "$LOG/.resume_step"
        echo "[$N] $name timed out — queued for ONE retry, aborting to re-probe"
        status_line "$name" "TIMEOUT" "(rc=124, $((SECONDS - t0))s; one retry queued)"
        exit 1
    fi
    if [ "$rc" -eq 0 ]; then
        status_line "$name" "PASS" "($((SECONDS - t0))s, $LOG/$name.log)"
    else
        local err
        err=$(grep -E "Error|assert" "$LOG/$name.log" | tail -1 | cut -c1-200)
        status_line "$name" "FAIL" "(rc=$rc, $((SECONDS - t0))s, $LOG/$name.log) — \`$err\`"
    fi
    echo "$((N + 1))" > "$LOG/.resume_step"
}

# Recovery windows are SHORT: tools/hw_combo batches many measurements into
# ONE python process so a window lands as many records as it can — backend
# init paid once, no per-step process teardown. The combo appends per-stage
# <name>.log files into $LOG and keeps its own stage resume
# (.combo_resume_*), so a mid-combo wedge (rc=3) resumes at the exact stage
# on the next recovery. The combo writes its own STATUS.md lines per stage.

# 1. the r4-red kernel parity contracts, re-run with the round-5 fixes
#    (wn backward VMEM cap raise; enc_check fp32-HIGHEST protocol), plus the
#    still-green r4 contracts (regression guard)
run combo_checks   python -m tools.hw_combo checks

# 2. headline bench (results.json of record; own process — its outage path
#    prints a structured skipped record and must stay independently runnable)
run bench          python bench.py

# 3. real-CLI train smoke on the chip (verify-skill recipe; needs ./data).
#    BEFORE the long combo tail: it is ~10 min and closes a two-round-old
#    red item (r4 weak #6), while combo_rest can consume the whole window.
run train_smoke    python train.py --model tests/fixtures/vqvae_tiny.yaml \
                       --dataset tests/fixtures/ljspeech_tiny.yaml \
                       --log_dir /tmp/hw_r5_smoke --batch_size 2 --total_epochs 1 \
                       --log_every_n_steps 2 --ckpt_every_n_steps 4 \
                       --eval_every_n_epochs 1 --max_steps 6

# 4. everything else in one process: per-metric aux suite (merges into
#    results.json), e2e synthesis RTF, device traces, dispatch probes, A/B
#    variants (--no-save)
run -t "${HW_COMBO_TIMEOUT:-21600}" combo_rest python -m tools.hw_combo rest

echo "ALL DONE — summaries:"
grep -h '"metric"' "$LOG"/*.log 2>/dev/null | head -40

# Condense evidence into one record file (the driver commits uncommitted
# work at round end).
mkdir -p "$DEST"
{
    echo "# round-5 hardware queue records — $(date -u +%FT%TZ)"
    for f in "$LOG"/*.log; do
        echo; echo "== $(basename "$f" .log)"
        tail -n 60 "$f"
    done
} > "$DEST/r5_records.txt"
echo "records -> $DEST/r5_records.txt"
