#!/bin/bash
# Round-4 hardware measurement queue (VERDICT r3 next #1).
#
# Runs every queued parity check and benchmark sequentially on the real
# chip — ONE TPU process at a time, generous timeouts (first compiles on
# this 1-core host can take minutes; timeout SIGTERM during a long compile
# has wedged the remote lease, so budgets are >= 1500 s).
#
# ORDERED BY VALUE: if the lease recovers late in the round and dies again
# partway through, the records that matter most must already be on disk —
# (1) the round-3 kernel parity contracts, (2) the headline bench, (3) the
# default-config results.json of record, then traces / probes / A/Bs.
# A/B variant runs use --no-save so results.json only ever holds the
# shipped default configuration regardless of where the queue stops.
#
# Usage: bash tools/hw_round4.sh [start_step]   # logs to benchmarks/hw_logs/r4/
set -u
cd "$(dirname "$0")/.."
# Logs + resume pointer live IN THE REPO, not /tmp: a session/VM restart
# wipes /tmp (it did, between round-4 sessions), which would lose both the
# evidence of a partially-run queue and the step to resume from.
# HW_* env overrides exist so tests/test_hw_queue.py can drive the abort/
# resume/retry state machine with a stub python and a tmp log dir.
LOG="${HW_LOG_DIR:-benchmarks/hw_logs/r4}"
DEST="${HW_RECORDS_DIR:-benchmarks/hw_logs}"
STEP_TIMEOUT="${HW_STEP_TIMEOUT:-2400}"
PROBE_TIMEOUT="${HW_PROBE_TIMEOUT:-90}"
mkdir -p "$LOG"
START=${1:-0}
N=0

probe() {
    timeout "$PROBE_TIMEOUT" python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" \
        > /dev/null 2>&1
}

run() {
    local name=$1; shift
    N=$((N + 1))
    [ "$N" -lt "$START" ] && { echo "[$N] skip $name"; return; }
    if ! probe; then
        echo "[$N] LEASE WEDGED before $name — aborting queue (resume: bash tools/hw_round4.sh $N)"
        echo "$N" > "$LOG/.resume_step"   # watcher auto-resumes from here
        exit 1
    fi
    echo "[$N] $name: $*"
    local t0=$SECONDS
    timeout "$STEP_TIMEOUT" "$@" > "$LOG/$name.log" 2>&1
    local rc=$?
    echo "[$N] $name rc=$rc (${LOG}/$name.log, $((SECONDS - t0))s)"
    if [ "$rc" -eq 124 ] && [ ! -e "$LOG/.retried_$N" ]; then
        # timeout usually means the lease wedged DURING the step — retry it
        # once on the next watcher recovery instead of skipping its record
        # (but only once: a step that wedges the lease every time must not
        # loop forever)
        touch "$LOG/.retried_$N"
        echo "$N" > "$LOG/.resume_step"
        echo "[$N] $name timed out — queued for ONE retry, aborting to re-probe"
        exit 1
    fi
    echo "$((N + 1))" > "$LOG/.resume_step"
}

# 1. kernel parity checks on hardware (round-3 contracts never chip-verified)
run fused_check    python -m tools.fused_check
run wn_check       python -m tools.wn_check
run enc_check      python -m tools.enc_check
run attn_check     python -m tools.attn_check
run flash_check    python -m tools.flash_check

# 2. headline bench + the full default auxiliary suite (results.json of record)
run bench          python bench.py
run benchmarks     python -m benchmarks.run_benchmarks

# 3. device traces for the MFU work (VERDICT r3 #2-4): op-time decomposition
run prof_glow      python -m tools.perf_profile --model glow
run prof_vqtts     python -m tools.perf_profile --model vqtts
run prof_lm        python -m tools.perf_profile --model lm

# 3b. dispatch-latency decomposition (VERDICT r3 #4): per-dispatch vs
# scan-of-K per-step time; scan/K << per-dispatch proves the batch-8 LM
# gap is host/tunnel execute latency, not on-device inefficiency
run disp_lm        python -m tools.dispatch_probe --model lm
run disp_glow      python -m tools.dispatch_probe --model glow
run disp_vqtts     python -m tools.dispatch_probe --model vqtts

# 4. A/B variants (print-only: --no-save keeps results.json at defaults)
run glow_condonly  env GLOW_FLOW_STEP=0 python -m benchmarks.run_benchmarks --only glow_train --no-save
run glow_noenc     env GLOW_ENC=0 python -m benchmarks.run_benchmarks --only glow_train --no-save
run vqtts_noenc    env VQTTS_ENC=0 python -m benchmarks.run_benchmarks --only vqtts_train --no-save
run glow_unfused   env GLOW_FUSED=0 python -m benchmarks.run_benchmarks --only glow_train --no-save
run vqtts_unfused  env VQTTS_FUSED=0 python -m benchmarks.run_benchmarks --only vqtts_train --no-save
run lm_unfused     env LM_FUSED=0 python -m benchmarks.run_benchmarks --only lm_train --no-save
run lm_batch64     env LM_BATCH=64 python -m benchmarks.run_benchmarks --only lm_train --no-save
run lm_spd8        env LM_SPD=8 python -m benchmarks.run_benchmarks --only lm_train --no-save

# 5. real-CLI train smoke on the chip (verify-skill recipe; needs ./data)
run train_smoke    python train.py --model tests/fixtures/vqvae_tiny.yaml \
                       --dataset tests/fixtures/ljspeech_tiny.yaml \
                       --log_dir /tmp/hw_r4_smoke --batch_size 2 --total_epochs 1 \
                       --log_every_n_steps 2 --ckpt_every_n_steps 4 \
                       --eval_every_n_epochs 1 --max_steps 6

echo "ALL DONE — summaries:"
grep -h '"metric"' "$LOG"/*.log 2>/dev/null | head -40

# Condense evidence into one record file (the driver commits uncommitted
# work at round end).
mkdir -p "$DEST"
{
    echo "# round-4 hardware queue records — $(date -u +%FT%TZ)"
    for f in "$LOG"/*.log; do
        echo; echo "== $(basename "$f" .log)"
        tail -n 60 "$f"
    done
} > "$DEST/r4_records.txt"
echo "records -> $DEST/r4_records.txt"
