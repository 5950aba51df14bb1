#!/bin/bash
# Round-5 full results matrix (VERDICT r4 #5): 256 pairs x 3 repeats for
# every ours-family row, per family; classical baselines at 256 x 1
# (internal C++ stochasticity; see make_results.py).  Overwrites
# RESULTS.md from scratch in family order.
# Usage: tools/eval_matrix_r5.sh <best_step_suncg> <best_step_matterport> <best_step_scannet>
set -ex
cd "$(dirname "$0")/.."
export RPTPU_SYNTH_CACHE=tmp/synth_cache
# 256-pair campaign: cap 4PCS search at 20 s/pair (early exits usually
# fire sooner; the reference's own cap is 240 s wall per subprocess)
export RPTPU_S4PCS_BUDGET=20
mkdir -p tmp/logs
BS_SUNCG=${1:-0.0}
BS_MP=${2:-0.0}
BS_SN=${3:-0.0}

python tools/make_results.py \
    --comp_ckpt relativepose_tpu/data/pretrained/suncg.comp.npz \
    --ft_ckpt relativepose_tpu/data/pretrained/suncg.comp_ft.npz \
    --maxIter 256 --num_repeat 3 --batch_pairs 8 --family suncg \
    --best_step $BS_SUNCG --refit_row --classical \
    --out RESULTS.md 2>&1 | tee tmp/logs/matrix_suncg_r5.log

python tools/make_results.py \
    --comp_ckpt relativepose_tpu/data/pretrained/matterport.comp.npz \
    --ft_ckpt relativepose_tpu/data/pretrained/matterport.comp_ft.npz \
    --maxIter 256 --num_repeat 3 --batch_pairs 8 --family matterport \
    --best_step $BS_MP --refit_row --classical --append \
    --out RESULTS.md 2>&1 | tee tmp/logs/matrix_matterport_r5.log

python tools/make_results.py \
    --comp_ckpt relativepose_tpu/data/pretrained/scannet.comp.npz \
    --ft_ckpt relativepose_tpu/data/pretrained/scannet.comp_ft.npz \
    --maxIter 256 --num_repeat 3 --batch_pairs 8 --family scannet \
    --best_step $BS_SN --refit_row --classical --append \
    --out RESULTS.md 2>&1 | tee tmp/logs/matrix_scannet_r5.log

echo MATRIX_DONE
