#!/bin/bash
# Train the completion (photometric fc target) + feature nets for one
# synthetic family (round-4 v3 recipe), then diagnose + RESULTS rows.
# Usage: campaign_family.sh <family> <n_pairs> [comp_epochs feat_epochs]
set -ex
cd "$(dirname "$0")/.."
export RPTPU_SYNTH_CACHE=tmp/synth_cache
FAM=$1; N=$2; COMP_EP=${3:-8}; FEAT_EP=${4:-3}

python -m relativepose_tpu.cli.train_completion \
    --exp comp_${FAM}_r4 --dataList synthetic --synthetic_family $FAM \
    --synthetic_n $N --featurelearning 1 \
    --view_detail_jitter 1 --fcWeightMode uniform --fcScale 2.0 \
    --fcTarget photometric --wDepth 2.0 --batch_size 6 \
    --train_duration 300 --max_epoch $COMP_EP --save_every 1 --rm \
    2>&1 | tee tmp/logs/comp_${FAM}_r4.log

python tools/diagnose_trained.py --family $FAM \
    --comp_ckpt experiments/exp_comp_${FAM}_r4/params --n 16 \
    2>&1 | tee tmp/logs/diag_comp_${FAM}_r4.log

python -m relativepose_tpu.cli.train_feature \
    --exp feat_${FAM}_r4 --dataList synthetic --synthetic_family $FAM \
    --synthetic_n $N --featurelearning 1 --batch_size 8 \
    --view_detail_jitter 1 \
    --train_duration 300 --max_epoch $FEAT_EP --save_every 1 --rm \
    2>&1 | tee tmp/logs/feat_${FAM}_r4.log

python tools/diagnose_trained.py --family $FAM \
    --feat_ckpt experiments/exp_feat_${FAM}_r4/params \
    --comp_ckpt experiments/exp_comp_${FAM}_r4/params --n 16 \
    2>&1 | tee tmp/logs/diag_full_${FAM}_r4.log

python tools/export_weights.py --ckpt experiments/exp_comp_${FAM}_r4/params \
    --out relativepose_tpu/data/pretrained/${FAM}.comp.npz
python tools/export_weights.py --ckpt experiments/exp_feat_${FAM}_r4/params \
    --out relativepose_tpu/data/pretrained/${FAM}.feat.npz

python tools/make_results.py \
    --comp_ckpt experiments/exp_comp_${FAM}_r4/params \
    --maxIter 64 --batch_pairs 8 --family $FAM --append \
    --out RESULTS.md > tmp/logs/make_results_${FAM}.log 2>&1
