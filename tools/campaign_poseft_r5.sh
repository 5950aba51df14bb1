#!/bin/bash
# Round-5 pose fine-tunes for suncg + matterport (VERDICT r4 #4): ALL
# overlap levels (round 4 trained on overlap<=0.55 only, regressing the
# 0.5-1.0 rotation bucket 0.84->1.23) and a stronger translation term
# (trans_weight 0.25 -> 1.0; translation was ~30x off the oracle).
# Starts from the shipped round-4 v3 completion checkpoints.
set -ex
cd "$(dirname "$0")/.."
export RPTPU_SYNTH_CACHE=tmp/synth_cache
mkdir -p tmp/logs

for FAM in suncg matterport; do
  python -m relativepose_tpu.cli.finetune_pose \
      --exp poseft_${FAM}_r5 --synthetic_family $FAM \
      --comp_ckpt relativepose_tpu/data/pretrained/${FAM}.comp.npz \
      --steps 300 --batch_pairs 4 --synthetic_n 512 \
      --max_overlap 1.0 --trans_weight 1.0 --rm \
      2>&1 | tee tmp/logs/poseft_${FAM}_r5.log

  python tools/export_weights.py \
      --ckpt experiments/exp_poseft_${FAM}_r5/params \
      --out relativepose_tpu/data/pretrained/${FAM}.comp_ft.npz
done

echo CAMPAIGN_DONE
