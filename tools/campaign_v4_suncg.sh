#!/bin/bash
# Round-5 v4 robustness retrain (VERDICT r4 #1): SCNet trained on scenes
# where the position-ramp cue is weakened (ramp_weight 0.15, vs v3's
# 0.35) AND interior clutter is on (occlusion + off-axis normals).
# The robustness table (tools/robustness_table.py) then evaluates both
# this and the shipped v3 checkpoint across the ramp x clutter grid.
# Only the completion net retrains: eval-time descriptors come from the
# SCNet 'f' head (photometric target), not netF.
set -ex
cd "$(dirname "$0")/.."
export RPTPU_SYNTH_CACHE=tmp/synth_cache
mkdir -p tmp/logs

python -m relativepose_tpu.cli.train_completion \
    --exp comp_suncg_r5v4 --dataList synthetic --synthetic_family suncg \
    --synthetic_n 2048 --featurelearning 1 \
    --ramp_weight 0.15 --n_clutter 4 \
    --view_detail_jitter 1 --fcWeightMode uniform --fcScale 2.0 \
    --fcTarget photometric --wDepth 2.0 --batch_size 6 \
    --train_duration 300 --max_epoch 8 --save_every 2 --rm \
    2>&1 | tee tmp/logs/comp_suncg_r5v4.log

python tools/diagnose_trained.py --family suncg \
    --comp_ckpt experiments/exp_comp_suncg_r5v4/params --n 16 \
    --ramp_weight 0.15 --n_clutter 4 \
    2>&1 | tee tmp/logs/diag_comp_suncg_r5v4.log

python tools/export_weights.py --ckpt experiments/exp_comp_suncg_r5v4/params \
    --out relativepose_tpu/data/pretrained/suncg.comp_v4.npz

echo CAMPAIGN_DONE
