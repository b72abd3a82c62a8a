#!/usr/bin/env bash
# Round-4b serial TPU queue: the remaining full-size quality evidence after
# the r4 postqueue (VERDICT r3 missing #3) — multiclass gets its first
# full-size run, then the ped/cyc curves (both still rising at their first
# horizons) are extended to 12k with the cosine recomputed over the longer
# horizon (same mechanism as the veh 40k->20k compression, in reverse;
# QUALITY.md horizon note).
#
# One bounded axon client at a time (claim hygiene — BENCH.md "claim wedge").
# Controls: touch /tmp/pause_queue (finish in-flight segment, wait) or
# /tmp/stop_queue (finish in-flight segment, exit). DEADLINE=<epoch s> stops
# new segments after that time.
#
# Usage: DEADLINE=$(date -d '+6 hours' +%s) nohup tools/run_r4b_queue.sh \
#            > /tmp/r4b_queue.out 2>&1 & echo $! > /tmp/queue.pid
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-0}
QLOG=experiments/quality_probes/queue.log
note() { echo "[r4b $(date -u +%H:%M:%S)] $*" | tee -a "$QLOG"; }

gate() {
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
  while [ "$step0" -lt "$total" ]; do
    gate || return 1
    CFG=$cfg TOTAL=$total SEG=$seg TAG=$tag EVAL_EVERY=$eval_every \
      EXTRA="$*" ONESHOT=1 tools/run_probe_segments.sh
    local new_step0=0
    [ -f "${save}.step" ] && new_step0=$(cat "${save}.step")
    if [ "$new_step0" -le "$step0" ]; then
      note "chain $cfg/$tag made no progress at $step0 — abandoning job"
      return 0
    fi
    step0=$new_step0
  done
  note "chain $cfg/$tag complete ($step0/$total)"
}

note "r4b queue start (deadline=$DEADLINE)"

# 1. multiclass full-size, first-ever run (first segment pays the 3-class
#    compile, ~10-15 min over the tunnel; batch 4 to match the single-class
#    full-size rows)
run_chain rangedet_multiclass_all_36e 12000 2000 tpu 1000 --batch 4 || exit 0

# 2. pedestrian extension 6k -> 12k: cosine recomputed over 12k, the resumed
#    optimizer count (6000) places it mid-decay — the run continues warm
run_chain rangedet_ped_wo_aug_4_18e 12000 2000 tpu 1000 || exit 0

# 3. cyclist extension 6k -> 12k, same mechanism
run_chain rangedet_cyc_wo_aug_4_18e 12000 2000 tpu 1000 || exit 0

note "r4b queue done"
