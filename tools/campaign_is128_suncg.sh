#!/bin/bash
# Round-5: train the designated quality/speed trade (docs/PERFORMANCE.md):
# SCNet with internal_size 128x256 (pano-aspect bottleneck, 35% fewer
# internal pixels, +15% pipeline throughput measured on random weights).
# Same v3 flagship recipe as campaign_family.sh suncg; quality is then
# paired against the 224x224 checkpoint on the 64-pair protocol.
set -ex
cd "$(dirname "$0")/.."
export RPTPU_SYNTH_CACHE=tmp/synth_cache
mkdir -p tmp/logs

python -m relativepose_tpu.cli.train_completion \
    --exp comp_suncg_is128 --dataList synthetic --synthetic_family suncg \
    --synthetic_n 2048 --featurelearning 1 \
    --internal_size 128x256 \
    --view_detail_jitter 1 --fcWeightMode uniform --fcScale 2.0 \
    --fcTarget photometric --wDepth 2.0 --batch_size 6 \
    --train_duration 300 --max_epoch 8 --save_every 2 --rm \
    2>&1 | tee tmp/logs/comp_suncg_is128.log

python tools/diagnose_trained.py --family suncg \
    --comp_ckpt experiments/exp_comp_suncg_is128/params --n 16 \
    --internal_size 128x256 \
    2>&1 | tee tmp/logs/diag_comp_suncg_is128.log

python tools/export_weights.py --ckpt experiments/exp_comp_suncg_is128/params \
    --out relativepose_tpu/data/pretrained/suncg.comp_is128.npz

echo CAMPAIGN_DONE
