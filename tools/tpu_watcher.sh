#!/bin/bash
# TPU-lease watcher: probes every 8 min; on recovery runs the round's
# hardware queue (tools/hw_round5.sh). If the lease dies mid-queue, goes
# back to probing and resumes the queue from the step it aborted at
# (benchmarks/hw_logs/r5/.resume_step — in-repo so a session/VM restart,
# which wipes /tmp, cannot lose it). One TPU process at a time is preserved:
# the queue serializes its own steps and the watcher never overlaps probes
# with a running queue.
#
# Launch detached:  setsid nohup bash tools/tpu_watcher.sh >/dev/null 2>&1 &
# Flags: /tmp/tpu_ok (lease alive), /tmp/hw_r5_running, /tmp/hw_r5_done (rc).
cd "$(dirname "$0")/.."
rm -f /tmp/tpu_ok /tmp/hw_r5_done
# Deadline guard: benchmarks/hw_logs/r5/.deadline holds a unix timestamp
# (floats tolerated — truncated on read). The queue's run() only launches a
# step that can FINISH by the deadline (margin = HW_STEP_TIMEOUT), so the
# watcher itself only needs margin for its own 75 s probe. Past the probe
# margin the watcher exits — the driver runs its own bench.py on the real
# chip at round end, and a second concurrent TPU client (this watcher's
# probe or queue) would hang it ("one TPU process at a time", CLAUDE.md).
past_deadline() {
  local d
  d=$(cat benchmarks/hw_logs/r5/.deadline 2>/dev/null) || return 1
  d=${d%%.*}
  [ -n "$d" ] && [ "$(($(date +%s) + 540))" -ge "$d" ]  # margin = its own 420 s probe
}
for i in $(seq 1 80); do
  if past_deadline; then
    echo "DEADLINE passed at $(date) — watcher exits to free the lease for the driver" >> /tmp/tpu_probe_r5.log
    exit 0
  fi
  echo "$(date +%H:%M:%S) probe $i" >> /tmp/tpu_probe_r5.log
  # 420 s: the lease's post-process handover stalls a first op 5-15 min on
  # this image before completing — a short probe keeps missing a lease that
  # is actually usable (observed 22:00-23:00 UTC Aug 19).
  if timeout 420 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" >> /tmp/tpu_probe_r5.log 2>&1; then
    echo "TPU RECOVERED at $(date)" >> /tmp/tpu_probe_r5.log
    touch /tmp/tpu_ok /tmp/hw_r5_running
    RESUME=$(cat benchmarks/hw_logs/r5/.resume_step 2>/dev/null || echo 0)
    bash tools/hw_round5.sh "$RESUME" >> /tmp/hw_r5_queue.log 2>&1
    rc=$?
    rm -f /tmp/hw_r5_running
    echo "queue attempt rc=$rc at $(date)" >> /tmp/tpu_probe_r5.log
    if [ "$rc" -eq 0 ]; then
      echo "$rc" > /tmp/hw_r5_done
      exit 0
    fi
    # lease died mid-queue: fall through and keep probing; next recovery
    # resumes from .resume_step
    rm -f /tmp/tpu_ok
  else
    echo "  still wedged" >> /tmp/tpu_probe_r5.log
  fi
  sleep 480
done
echo "TPU never recovered within the watch window" >> /tmp/tpu_probe_r5.log
exit 1
