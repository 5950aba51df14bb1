#!/bin/bash
# Round-4 suncg training campaign (serial TPU jobs).
# Changes vs round 3 (docs/TRAINING.md r4 section):
#   * view_detail_jitter=1 — per-view fine-texture seeds make descriptors
#     cross-view-stable BY CONSTRUCTION (data/synthetic.py::_texture);
#   * fcWeightMode=uniform fcScale=2 — supervise hallucinated descriptors
#     uniformly, not with the boundary-decaying geow;
#   * wDepth=2 — completed depth feeds the solver's 0.08 m filters.
set -ex
cd "$(dirname "$0")/.."
export RPTPU_SYNTH_CACHE=tmp/synth_cache

python -m relativepose_tpu.cli.train_feature \
    --exp feat_suncg_r4 --dataList synthetic --synthetic_family suncg \
    --synthetic_n 2048 --featurelearning 1 --batch_size 8 \
    --view_detail_jitter 1 \
    --train_duration 300 --max_epoch 6 --save_every 1 --rm \
    2>&1 | tee tmp/logs/feat_suncg_r4.log

python tools/diagnose_trained.py \
    --feat_ckpt experiments/exp_feat_suncg_r4/params --n 32 \
    2>&1 | tee tmp/logs/diag_feat_r4.log

python -m relativepose_tpu.cli.train_completion \
    --exp comp_suncg_r4 --dataList synthetic --synthetic_family suncg \
    --synthetic_n 2048 --featurelearning 1 \
    --view_detail_jitter 1 --fcWeightMode uniform --fcScale 2.0 --wDepth 2.0 \
    --feat_ckpt experiments/exp_feat_suncg_r4/params --batch_size 8 \
    --train_duration 300 --max_epoch 16 --save_every 1 --rm \
    2>&1 | tee tmp/logs/comp_suncg_r4.log

python tools/diagnose_trained.py \
    --feat_ckpt experiments/exp_feat_suncg_r4/params \
    --comp_ckpt experiments/exp_comp_suncg_r4/params --n 32 \
    2>&1 | tee tmp/logs/diag_comp_r4.log

python tools/hybrid_diag.py \
    --comp_ckpt experiments/exp_comp_suncg_r4/params \
    --feat_ckpt experiments/exp_feat_suncg_r4/params \
    --n 64 2>&1 | tee tmp/logs/hybrid_diag_r4.log
