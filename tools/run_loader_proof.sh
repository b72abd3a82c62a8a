#!/usr/bin/env bash
# Multi-epoch loader-path training proof at FULL SIZE on the real TPU
# (VERDICT r3 #6): train tools/train.py from a built roidb (the offline
# builder's npz/roidb schema, staged by
#   python scripts/rehearse_real_pipeline.py --full-size --stop-after-build \
#       --height 64 --width 2650 --frames-train 32 --frames-val 8 \
#       --workdir experiments/loader_fullsize_data
# ), with eval-every on the validation split and a MID-RUN RESUME across an
# epoch boundary (two bounded TPU clients — axon claim hygiene).
#
# Reference semantics being proven: utils/detection_module.py:983-1161 fit
# loop (epoch boundaries, shuffled loader, checkpoint cadence, resume).
set -u
cd "$(dirname "$0")/.."
DATA=experiments/loader_fullsize_data/built
EXP=experiments/loader_fullsize
LOG=experiments/quality_probes/loader_fullsize.log
CFG=${CFG:-rangedet_veh_wo_aug_4_18e}
HALF=${HALF:-100}
TOTAL=${TOTAL:-200}
EVAL_EVERY=${EVAL_EVERY:-25}

mkdir -p "$EXP" experiments/quality_probes
echo "=== loader proof stage 1: epochs 0..$((HALF-1)) ($(date -u +%H:%M:%S)) ===" >> "$LOG"
python -u tools/train.py --config "$CFG" --data-root "$DATA" \
  --experiment-dir "$EXP" --epochs "$HALF" --eval-every "$EVAL_EVERY" \
  --checkpoint-every 25 \
  --num-workers 2 >> "$LOG" 2>&1 || { echo "stage 1 FAILED" >> "$LOG"; exit 1; }
echo "=== loader proof stage 2 (RESUME): epochs $HALF..$((TOTAL-1)) ($(date -u +%H:%M:%S)) ===" >> "$LOG"
python -u tools/train.py --config "$CFG" --data-root "$DATA" \
  --experiment-dir "$EXP" --epochs "$TOTAL" --eval-every "$EVAL_EVERY" \
  --checkpoint-every 25 \
  --resume --num-workers 2 >> "$LOG" 2>&1 || { echo "stage 2 FAILED" >> "$LOG"; exit 1; }
echo "=== loader proof complete ($(date -u +%H:%M:%S)) ===" >> "$LOG"
