#!/bin/bash
# Round-5 scannet evaluation chain (run after campaign_scannet_r5.sh).
# 1. Calibrate the best_score/min_score step-selection gate on VAL scenes
#    (seed 10000 — never the protocol's held-out seed 20000).
# 2. Full 256-pair x 3-repeat protocol matrix with the chosen gate,
#    pose-ft row, refit A/B row, and classical baselines.
set -ex
cd "$(dirname "$0")/.."
export RPTPU_SYNTH_CACHE=tmp/synth_cache
mkdir -p tmp/logs
CK=experiments/exp_comp_scannet_r5/params
FT=experiments/exp_poseft_scannet_r5/params

# --- calibration on val scenes ---
for MS in 0.0 0.15 0.3; do
  python -m relativepose_tpu.cli.evaluate --dataList synthetic \
      --synthetic_family scannet --method ours --maxIter 64 \
      --batch_pairs 8 --comp_ckpt $CK --eval_seed 10000 \
      --step_select best_score --min_score $MS \
      --exp cal_scannet_bs_$MS --rm 2>&1 | tail -3 \
      | tee -a tmp/logs/cal_scannet_r5.log
done
# reference-semantics val row for comparison
python -m relativepose_tpu.cli.evaluate --dataList synthetic \
    --synthetic_family scannet --method ours --maxIter 64 \
    --batch_pairs 8 --comp_ckpt $CK --eval_seed 10000 \
    --per_step_errors 1 \
    --exp cal_scannet_last --rm 2>&1 | tail -3 \
    | tee -a tmp/logs/cal_scannet_r5.log

echo CALIBRATION_DONE
