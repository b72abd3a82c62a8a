#!/usr/bin/env bash
# Bounded perf-measurement slot between queue segments (claim hygiene:
# /tmp/pause_queue must already be set; we wait for the in-flight segment to
# finish, measure, then release). No kill timeouts on TPU clients — both
# profilers are bounded by construction (fixed iteration counts).
#
# Usage: nohup tools/run_perf_slot2.sh > /tmp/perfslot2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
note() { echo "[slot2 $(date -u +%H:%M:%S)] $*"; }

[ -f /tmp/pause_queue ] || { note "pause flag missing — refusing"; exit 1; }

STEPF=experiments/quality_probes/rangedet_multiclass_all_36e_tpu.npz.step
LOGF=experiments/quality_probes/rangedet_multiclass_all_36e_tpu.log
# wait until the in-flight segment exits: .step is written at segment end,
# and the log stops growing
last_mtime=0
while :; do
  m=$(stat -c %Y "$LOGF" 2>/dev/null || echo 0)
  s=$(stat -c %Y "$STEPF" 2>/dev/null || echo 0)
  now=$(date +%s)
  # segment done = step file newer than log's last write and both quiet 60s
  if [ "$s" -ge "$m" ] && [ $((now - s)) -ge 60 ] && [ $((now - m)) -ge 60 ]; then
    break
  fi
  last_mtime=$m
  sleep 30
done
note "segment done (step=$(cat "$STEPF" 2>/dev/null)); measuring"

python -u tools/profile_iou_target.py --iters 20 --boxes 20
note "isolated iou modes done"

python -u tools/profile_step_ab.py --iters 30 \
  --variants noskip,skip_gate8,skip_gate,planar
note "donated-step A/B done; releasing queue"
rm -f /tmp/pause_queue
