#!/bin/bash
# Round-5 scannet full-budget campaign (VERDICT r4 #2): same budget as the
# suncg family got in round 4 — 2048 pairs, 16x300s completion epochs,
# 6x300s feature epochs — plus an all-overlap pose fine-tune.
# The kinect mask observes ~7% of the pano (vs 25% for 'second'), so this
# family needs the most completion training of the three.
# Usage: tools/campaign_scannet_r5.sh
set -ex
cd "$(dirname "$0")/.."
export RPTPU_SYNTH_CACHE=tmp/synth_cache
mkdir -p tmp/logs
FAM=scannet
N=2048

python -m relativepose_tpu.cli.train_completion \
    --exp comp_${FAM}_r5 --dataList synthetic --synthetic_family $FAM \
    --synthetic_n $N --featurelearning 1 \
    --view_detail_jitter 1 --fcWeightMode uniform --fcScale 2.0 \
    --fcTarget photometric --wDepth 2.0 --batch_size 6 \
    --train_duration 300 --max_epoch 16 --save_every 2 --rm \
    2>&1 | tee tmp/logs/comp_${FAM}_r5.log

python tools/diagnose_trained.py --family $FAM \
    --comp_ckpt experiments/exp_comp_${FAM}_r5/params --n 16 \
    2>&1 | tee tmp/logs/diag_comp_${FAM}_r5.log

python -m relativepose_tpu.cli.train_feature \
    --exp feat_${FAM}_r5 --dataList synthetic --synthetic_family $FAM \
    --synthetic_n $N --featurelearning 1 --batch_size 8 \
    --view_detail_jitter 1 \
    --train_duration 300 --max_epoch 6 --save_every 1 --rm \
    2>&1 | tee tmp/logs/feat_${FAM}_r5.log

python tools/export_weights.py --ckpt experiments/exp_comp_${FAM}_r5/params \
    --out relativepose_tpu/data/pretrained/${FAM}.comp.npz
python tools/export_weights.py --ckpt experiments/exp_feat_${FAM}_r5/params \
    --out relativepose_tpu/data/pretrained/${FAM}.feat.npz

# all-overlap pose fine-tune with a stronger translation term
# (VERDICT r4 #4: low-overlap-only selection left translation and the
# 0.5-1.0 rotation bucket behind)
python -m relativepose_tpu.cli.finetune_pose \
    --exp poseft_${FAM}_r5 --synthetic_family $FAM \
    --comp_ckpt experiments/exp_comp_${FAM}_r5/params \
    --steps 300 --batch_pairs 4 --synthetic_n 256 \
    --max_overlap 1.0 --trans_weight 1.0 --rm \
    2>&1 | tee tmp/logs/poseft_${FAM}_r5.log

python tools/export_weights.py --ckpt experiments/exp_poseft_${FAM}_r5/params \
    --out relativepose_tpu/data/pretrained/${FAM}.comp_ft.npz

echo CAMPAIGN_DONE
