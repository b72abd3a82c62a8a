#!/usr/bin/env bash
# Round-5 serial TPU queue — the remaining quality evidence from VERDICT r4:
#   1. veh far-range + clutter streaming probe (weak #2: the stride-1 far
#      field / [50,inf) RANGE bucket has never been quality-exercised)
#   2. multiclass far + clutter probe (weak #2b: cyc AP saturated at 1.000 —
#      raise scene difficulty so the benchmark discriminates again)
#   3. augmentation-ON loader run (weak #6: data/augment.py has never trained
#      a model) — the SAME 2048-frame roidb dataset as the no-aug loader run
#      that scored held-out L1 3D-AP@0.7 0.8818, with the on-device
#      flip+rotation twin (--device-cache --device-augment), then the full
#      test.py -> bin -> eval/ap.py artifact chain on the terminal checkpoint.
#
# One bounded axon client at a time (claim hygiene — BENCH.md "claim wedge").
# Controls: touch /tmp/pause_queue (finish in-flight segment, wait) or
# /tmp/stop_queue (finish in-flight segment, exit). DEADLINE=<epoch s> stops
# new segments after that time.
#
# Usage: DEADLINE=$(date -d '+7 hours' +%s) nohup tools/run_r5_queue.sh \
#            > /tmp/r5_queue.out 2>&1 & echo $! > /tmp/queue.pid
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-0}
QLOG=experiments/quality_probes/queue.log
note() { echo "[r5 $(date -u +%H:%M:%S)] $*" | tee -a "$QLOG"; }

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

note "r5 queue start (deadline=$DEADLINE)"

# 1. veh far-range + clutter (vehicles out to 68 m, 6 unlabeled occluders)
run_chain rangedet_veh_wo_aug_4_18e 12000 2000 far 1000 \
  --batch 4 --far --clutter 6 || exit 0

# 2. multiclass far + clutter (de-saturates the cyc 1.000 / ped 0.976 rows)
run_chain rangedet_multiclass_all_36e 12000 2000 far 1000 \
  --batch 4 --far --clutter 6 || exit 0

# 3. augmentation-ON loader run: one clean bounded client (the no-aug twin
#    ran 32 epochs in one client); windowed metric fetch makes the epoch
#    ~105 s. Terminal artifact chain mirrors the no-aug 0.8818 proof.
AUG_EXP=experiments/loader_aug
AUG_LOG=experiments/quality_probes/loader_aug.log
if [ ! -f "$AUG_EXP/rangedet_veh_wo_aug_4_18e/checkpoints/epoch_0031/.done_marker" ] \
   && ! grep -q "training complete" "$AUG_LOG" 2>/dev/null; then
  gate || exit 0
  note "loader_aug: 32-epoch device-cache run with --device-augment flip,rotation"
  resume=""
  [ -d "$AUG_EXP/rangedet_veh_wo_aug_4_18e/checkpoints" ] && resume="--resume"
  python -u tools/train.py --config rangedet_veh_wo_aug_4_18e \
    --data-root experiments/loader_quality_data/built --device-cache \
    --sampling-rate 1 \
    --device-augment flip,rotation --experiment-dir "$AUG_EXP" \
    --epochs 32 --eval-every 4 --checkpoint-every 8 --tensorboard \
    $resume >> "$AUG_LOG" 2>&1 || note "loader_aug train FAILED (rc=$?)"
fi
if grep -q "training complete" "$AUG_LOG" 2>/dev/null \
   && [ ! -f "$AUG_EXP/eval_ep31.json" ]; then
  gate || exit 0
  note "loader_aug: terminal artifact chain (test.py -> json -> eval/ap.py)"
  python -u tools/test.py --config rangedet_veh_wo_aug_4_18e \
    --data-root experiments/loader_quality_data/built \
    --experiment-dir "$AUG_EXP" --image-set validation \
    --output "$AUG_EXP/predictions_ep31.pkl" >> "$AUG_LOG" 2>&1 \
    && python tools/create_prediction_bin_3d.py \
         --pred "$AUG_EXP/predictions_ep31.pkl" \
         --out "$AUG_EXP/submission_ep31.json" >> "$AUG_LOG" 2>&1 \
    && python tools/evaluate_pred.py --config rangedet_veh_wo_aug_4_18e \
         --pred "$AUG_EXP/predictions_ep31.pkl" --buckets \
         --out "$AUG_EXP/eval_ep31.json" >> "$AUG_LOG" 2>&1 \
    || note "loader_aug eval chain FAILED"
fi

note "r5 queue done"
