#!/usr/bin/env bash
# Post-queue TPU mop-up for the end of a round: waits for the serial probe
# queue (tools/run_probe_queue.sh) to exit, then spends the remaining time
# budget on the highest-value missing evidence, one bounded client at a time
# (claim hygiene — BENCH.md "claim wedge"):
#   1. ped terminal held-out eval with RANGE buckets (eval-only resume; the
#      6k chain's last segment predates the terminal-eval logging fix)
#   2. multiclass full-size segments (zero full-size evidence otherwise)
#   3. extra cyclist segments with whatever time is left
#
# Usage: POST_DEADLINE=<epoch s> nohup tools/run_postqueue.sh \
#            > /tmp/postqueue.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
POST_DEADLINE=${POST_DEADLINE:?set POST_DEADLINE (epoch seconds)}
QLOG=experiments/quality_probes/queue.log
note() { echo "[postq $(date -u +%H:%M:%S)] $*" | tee -a "$QLOG"; }
left() { echo $(( POST_DEADLINE - $(date +%s) )); }

# 0. wait for the queue process (never two TPU clients at once)
if [ -f /tmp/queue.pid ]; then
  qp=$(cat /tmp/queue.pid)
  while kill -0 "$qp" 2>/dev/null; do sleep 20; done
fi
note "queue exited; post-queue begins ($(left)s left)"

# 1. ped terminal eval (cheap: no train steps, cached compile)
if [ "$(left)" -gt 300 ]; then
  note "ped terminal eval-only"
  python -u tools/quality_probe.py --config rangedet_ped_wo_aug_4_18e \
    --steps 6000 --step0 6000 --stop-after 0 \
    --resume experiments/quality_probes/rangedet_ped_wo_aug_4_18e_tpu.npz \
    >> experiments/quality_probes/rangedet_ped_wo_aug_4_18e_tpu.log 2>&1 \
    || note "ped terminal eval FAILED"
fi

seg_chain() {  # CFG TOTAL SEG TAG EVAL_EVERY min_time_s
  local cfg=$1 total=$2 seg=$3 tag=$4 ev=$5 min_s=$6
  local save=experiments/quality_probes/${cfg}_${tag}.npz step0=0
  [ -f "${save}.step" ] && step0=$(cat "${save}.step")
  while [ "$step0" -lt "$total" ] && [ "$(left)" -gt "$min_s" ]; do
    note "postq segment $cfg/$tag at $step0 ($(left)s left)"
    CFG=$cfg TOTAL=$total SEG=$seg TAG=$tag EVAL_EVERY=$ev ONESHOT=1 \
      tools/run_probe_segments.sh
    local ns=0; [ -f "${save}.step" ] && ns=$(cat "${save}.step")
    [ "$ns" -le "$step0" ] && { note "no progress — abandoning $cfg"; break; }
    step0=$ns
  done
}

# 2. one cyclist continuation segment first — its programs are already in
#    the XLA cache (~13 min for 2000 steps), whereas multiclass pays a
#    fresh 3-class compile; capping the chain at 4000 here guarantees
#    multiclass still gets its slot
seg_chain rangedet_cyc_wo_aug_4_18e 4000 2000 tpu 1000 800
# 3. multiclass full-size (needs headroom: the first segment compiles the
#    3-class train+eval programs, ~10-15 min over the tunnel)
seg_chain rangedet_multiclass_all_36e 6000 1200 tpu 1200 1100
# 4. cyclist leftovers with whatever time remains
seg_chain rangedet_cyc_wo_aug_4_18e 6000 2000 tpu 1000 800

note "post-queue done ($(left)s left)"
