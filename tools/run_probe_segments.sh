#!/usr/bin/env bash
# Generic full-size held-out quality probe, run as a chain of short bounded
# segments so every TPU client exits on its own (axon claim hygiene — see
# BENCH.md "claim wedge": never kill a mid-step client). Each segment saves
# params+opt state and the next resumes warm; the persistent XLA cache makes
# segments after the first compile-free.
#
# Usage (env-driven):
#   CFG=rangedet_veh_wo_aug_4_18e TOTAL=40000 SEG=2000 TAG=sgd \
#   EXTRA="--optimizer sgd --lr 0.025 --batch 4 --warmup-steps 4000" \
#   tools/run_probe_segments.sh
#
# Stop the chain by touching /tmp/stop_probe_$TAG (takes effect between
# segments; the in-flight segment still exits cleanly).
set -u
cd "$(dirname "$0")/.."
CFG=${CFG:-rangedet_veh_wo_aug_4_18e}
SEG=${SEG:-2000}          # steps per segment (one bounded TPU client each)
TOTAL=${TOTAL:-40000}     # LR-schedule horizon (cosine spans this)
TAG=${TAG:-run}
EXTRA=${EXTRA:-}
ONESHOT=${ONESHOT:-0}     # 1 = run a single segment then exit (queue mode)
EVAL_EVERY=${EVAL_EVERY:-1000}
LOG_EVERY=${LOG_EVERY:-200}
SAVE=experiments/quality_probes/${CFG}_${TAG}.npz
LOG=experiments/quality_probes/${CFG}_${TAG}.log
STOP=/tmp/stop_probe_${TAG}
step0=0
if [ -f "${SAVE}.step" ]; then step0=$(cat "${SAVE}.step"); fi
while [ "$step0" -lt "$TOTAL" ]; do
  [ -f "$STOP" ] && { echo "stop flag — halting chain at step $step0" >> "$LOG"; break; }
  # last segment: never train past the LR-schedule horizon
  SEG=$(( step0 + SEG > TOTAL ? TOTAL - step0 : SEG ))
  resume=""
  [ -f "$SAVE" ] && resume="--resume $SAVE"
  echo "=== segment: step0=$step0 / $TOTAL ($(date -u +%H:%M:%S)) ===" >> "$LOG"
  python -u tools/quality_probe.py --config "$CFG" \
    --steps "$TOTAL" --stop-after "$SEG" --eval-every "$EVAL_EVERY" \
    --log-every "$LOG_EVERY" \
    --save "$SAVE" $resume --step0 "$step0" $EXTRA >> "$LOG" 2>&1 || {
      echo "segment failed (rc=$?) — retrying once after 60s" >> "$LOG";
      sleep 60;
      python -u tools/quality_probe.py --config "$CFG" \
        --steps "$TOTAL" --stop-after "$SEG" --eval-every "$EVAL_EVERY" \
        --log-every "$LOG_EVERY" \
        --save "$SAVE" $resume --step0 "$step0" $EXTRA >> "$LOG" 2>&1 || {
          echo "segment failed twice — halting chain at step $step0" >> "$LOG";
          break;
        };
    }
  step0=$((step0 + SEG))
  echo "$step0" > "${SAVE}.step"
  [ "$ONESHOT" = "1" ] && exit 0
done
echo "chain done at step $step0 / $TOTAL ($(date -u +%H:%M:%S))" >> "$LOG"
