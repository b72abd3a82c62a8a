#!/usr/bin/env bash
# Full-size pedestrian held-out quality probe, run as a chain of short
# bounded segments so every TPU client exits on its own (axon claim
# hygiene — see BENCH.md "claim wedge": never kill a mid-step client).
# Each segment saves params+opt state and the next resumes warm; the
# persistent XLA cache makes segments after the first compile-free.
# Stop the chain by touching /tmp/stop_probe (takes effect between
# segments; the in-flight segment still exits cleanly).
set -u
cd "$(dirname "$0")/.."
CFG=${CFG:-rangedet_ped_wo_aug_4_18e}
SEG=${SEG:-1000}          # steps per segment (one bounded TPU client each)
TOTAL=${TOTAL:-8000}      # LR-schedule horizon (cosine spans this)
SAVE=experiments/quality_probes/${CFG}_tpu.npz
LOG=experiments/quality_probes/${CFG}_tpu.log
step0=0
if [ -f "${SAVE}.step" ]; then step0=$(cat "${SAVE}.step"); fi
while [ "$step0" -lt "$TOTAL" ]; do
  [ -f /tmp/stop_probe ] && { echo "stop flag — halting chain at step $step0" >> "$LOG"; break; }
  resume=""
  [ -f "$SAVE" ] && resume="--resume $SAVE"
  echo "=== segment: step0=$step0 / $TOTAL ===" >> "$LOG"
  python -u tools/quality_probe.py --config "$CFG" \
    --steps "$TOTAL" --stop-after "$SEG" --eval-every 500 --log-every 100 \
    --save "$SAVE" $resume --step0 "$step0" >> "$LOG" 2>&1 || { echo "segment failed" >> "$LOG"; break; }
  step0=$((step0 + SEG))
  echo "$step0" > "${SAVE}.step"
done
