#!/usr/bin/env bash
# Serial TPU job queue for full-size held-out quality probes: exactly one
# bounded axon client at a time (claim hygiene — BENCH.md "claim wedge").
# Each job is a chain of short segments via tools/run_probe_segments.sh;
# every segment saves params+opt state and resumes warm, so the queue can be
# stopped/resumed at any boundary.
#
# Controls:
#   touch /tmp/pause_queue      — finish the in-flight segment, then wait
#                                 (rm the flag to continue)
#   touch /tmp/stop_queue       — finish the in-flight segment, then exit
#   DEADLINE=<epoch seconds>    — start no new segment after this time
#
# Usage:  DEADLINE=$(date -d '+8 hours' +%s) nohup tools/run_probe_queue.sh \
#             > /tmp/probe_queue.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-0}
QLOG=experiments/quality_probes/queue.log

note() { echo "[queue $(date -u +%H:%M:%S)] $*" | tee -a "$QLOG"; }

gate() {  # returns 1 when the queue should stop
  while [ -f /tmp/pause_queue ]; do sleep 30; done
  [ -f /tmp/stop_queue ] && { note "stop flag — queue exiting"; return 1; }
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    note "deadline reached — queue exiting"; return 1
  fi
  return 0
}

run_chain() {  # CFG TOTAL SEG TAG EVAL_EVERY EXTRA...
  local cfg=$1 total=$2 seg=$3 tag=$4 eval_every=$5; shift 5
  local save=experiments/quality_probes/${cfg}_${tag}.npz
  local step0=0
  [ -f "${save}.step" ] && step0=$(cat "${save}.step")
  if [ "$step0" -ge "$total" ]; then
    note "chain $cfg/$tag already complete ($step0/$total)"; return 0
  fi
  note "chain $cfg/$tag: $step0 -> $total (seg $seg)"
  # the per-chain stop flag is how the segment loop honors OUR gates, so run
  # segment-by-segment here instead of delegating the whole loop
  while [ "$step0" -lt "$total" ]; do
    gate || return 1
    CFG=$cfg TOTAL=$total SEG=$seg TAG=$tag EVAL_EVERY=$eval_every \
      EXTRA="$*" ONESHOT=1 tools/run_probe_segments.sh
    local new_step0=0
    [ -f "${save}.step" ] && new_step0=$(cat "${save}.step")
    if [ "$new_step0" -le "$step0" ]; then
      note "chain $cfg/$tag made no progress at $step0 — abandoning job"
      return 0   # move on to the next job rather than wedging the queue
    fi
    step0=$new_step0
  done
  note "chain $cfg/$tag complete ($step0/$total)"
}

note "queue start (deadline=$DEADLINE)"

# 1. vehicle, recipe-exact SGD (VERDICT #2) — resumes the run stopped at
#    12k/40k in the stalled session. The horizon is COMPRESSED 40k -> 20k so
#    the cosine reaches zero inside the round AND the run becomes
#    apples-to-apples with the r3 adamw probe (same 20k horizon, same batch,
#    only the optimizer differs). The resumed optimizer count (12000) places
#    the recomputed cosine at 12/20 — a continuous downward LR step
#    (0.0199 -> 0.0086), documented in QUALITY.md.
run_chain rangedet_veh_wo_aug_4_18e 20000 2000 sgd 1000 \
  --optimizer sgd --lr 0.025 --batch 4 --warmup-steps 4000 || exit 0

# 2. pedestrian full-size completion (VERDICT #3) — keep the original 6000
#    LR horizon the run was started with
run_chain rangedet_ped_wo_aug_4_18e 6000 2500 tpu 500 || exit 0

# 3. loader-path multi-epoch training proof at full size (VERDICT #6):
#    tools/train.py over the full-size roidb staged by
#    scripts/rehearse_real_pipeline.py --full-size --stop-after-build,
#    with eval-every and a mid-run resume across an epoch boundary.
if [ -x tools/run_loader_proof.sh ] && [ -d /root/repo/experiments/loader_fullsize_data/built/training/npz ]; then
  gate || exit 0
  note "loader-path full-size proof"
  tools/run_loader_proof.sh || note "loader proof FAILED (continuing queue)"
else
  note "loader proof skipped (dataset not staged)"
fi

# 4. cyclist full-size (VERDICT #3)
run_chain rangedet_cyc_wo_aug_4_18e 6000 2000 tpu 1000 || exit 0

# 5. multiclass full-size (VERDICT #3)
run_chain rangedet_multiclass_all_36e 6000 2000 tpu 1000 || exit 0

note "queue drained"
