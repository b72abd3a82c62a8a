#!/usr/bin/env bash
# Train -> test -> Waymo-bin pipeline, equivalent of the reference's
# scripts/train_rangedet.sh (train.py && test.py && create_prediction_bin_3d.py)
# without the mpirun/horovod wrapper: GSPMD covers local chips, and multi-host
# runs add --multihost (jax.distributed).
set -euo pipefail
CONFIG=${1:?usage: run_pipeline.sh <config> [data_root]}
DATA_ROOT=${2:-}
if [[ -n "$DATA_ROOT" ]]; then
    python tools/train.py --config "$CONFIG" --data-root "$DATA_ROOT"
    python tools/test.py --config "$CONFIG" --data-root "$DATA_ROOT"
else
    python tools/train.py --config "$CONFIG" --synthetic --steps-per-epoch 100
    python tools/test.py --config "$CONFIG" --synthetic 8
fi
python tools/create_prediction_bin_3d.py \
    --pred "experiments/$CONFIG/predictions.pkl" \
    --out "experiments/$CONFIG/submission.bin"
