#!/bin/bash
# Train feature + completion nets for one synthetic family (r4 recipe),
# then diagnose.  Usage: campaign_family.sh <family> <n_pairs> [feat_min comp_min]
set -ex
cd "$(dirname "$0")/.."
export RPTPU_SYNTH_CACHE=tmp/synth_cache
FAM=$1; N=$2; FEAT_EP=${3:-5}; COMP_EP=${4:-10}

python -m relativepose_tpu.cli.train_feature \
    --exp feat_${FAM}_r4 --dataList synthetic --synthetic_family $FAM \
    --synthetic_n $N --featurelearning 1 --batch_size 8 \
    --view_detail_jitter 1 \
    --train_duration 300 --max_epoch $FEAT_EP --save_every 1 --rm \
    2>&1 | tee tmp/logs/feat_${FAM}_r4.log

python tools/diagnose_trained.py --family $FAM \
    --feat_ckpt experiments/exp_feat_${FAM}_r4/params --n 16 \
    2>&1 | tee tmp/logs/diag_feat_${FAM}_r4.log

python -m relativepose_tpu.cli.train_completion \
    --exp comp_${FAM}_r4 --dataList synthetic --synthetic_family $FAM \
    --synthetic_n $N --featurelearning 1 \
    --view_detail_jitter 1 --fcWeightMode uniform --fcScale 2.0 --wDepth 2.0 \
    --feat_ckpt experiments/exp_feat_${FAM}_r4/params --batch_size 8 \
    --train_duration 300 --max_epoch $COMP_EP --save_every 1 --rm \
    2>&1 | tee tmp/logs/comp_${FAM}_r4.log

python tools/diagnose_trained.py --family $FAM \
    --feat_ckpt experiments/exp_feat_${FAM}_r4/params \
    --comp_ckpt experiments/exp_comp_${FAM}_r4/params --n 16 \
    2>&1 | tee tmp/logs/diag_comp_${FAM}_r4.log
