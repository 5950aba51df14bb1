"""Pano-completion training driver (mirrors mainPanoCompletion2view.py).

Usage:
    python -m relativepose_tpu.cli.train_completion --exp comp_suncg \
        --dataList synthetic --synthetic_family suncg --featurelearning 1 \
        --feat_ckpt experiments/exp_feat_suncg/params

Loads the frozen feature net from a feature-training checkpoint
(the reference's data/pretrained_model/<ds>.feat.pth.tar).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from relativepose_tpu.cli import common
from relativepose_tpu.cli.common import add_common_training_args, resolve_dataset
from relativepose_tpu.cli.train_feature import make_loaders
from relativepose_tpu.train import completion, mesh
from relativepose_tpu.utils.callbacks import (
    CallbackLoc,
    OnceCallback,
    PeriodicCallback,
)
from relativepose_tpu.utils.checkpoint import CheckpointManager
from relativepose_tpu.utils.experiment import ExperimentDirs, parameters_count
from relativepose_tpu.utils.log import AverageMeter, FileLogger
from relativepose_tpu.utils.trainer import Trainer


def main(argv=None):
    import relativepose_tpu
    relativepose_tpu.enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    add_common_training_args(p)
    p.add_argument("--synthetic_family", type=str, default="suncg")
    p.add_argument("--synthetic_n", type=int, default=None,
                   help="synthetic train-set size (val = n/8)")
    p.add_argument("--train_duration", type=float, default=300.0)
    p.add_argument("--save_every", type=int, default=5)
    p.add_argument("--feat_ckpt", type=str, default=None,
                   help="feature-net checkpoint dir (frozen netF)")
    p.add_argument("--torch_feat_ckpt", type=str, default=None,
                   help="reference netF state-dict (.pth.tar) — the "
                        "reference's data/pretrained_model/<ds>.feat"
                        ".pth.tar (mainPanoCompletion2view.py:127-150)")
    p.add_argument("--device_data", type=int, default=1,
                   help="keep the synthetic set HBM-resident (0 = stream)")
    p.add_argument("--log_every", type=int, default=10,
                   help="host metric fetch cadence (each fetch syncs)")
    args = p.parse_args(argv)
    dataset, mask_method = resolve_dataset(args)

    dirs = ExperimentDirs(args.exp, rm=args.rm, resume=args.resume)
    logf = FileLogger(dirs.log_path)
    cfg = completion.CompletionTrainConfig(
        dataset=dataset, mask_method=mask_method,
        output_type=args.outputType, snumclass=args.snumclass,
        feature_dim=args.featureDim, use_tanh=bool(args.useTanh),
        skip_layer=bool(args.skipLayer), batchnorm=bool(args.batchnorm),
        feature_learning=bool(args.featurelearning),
        geometric_weight=bool(args.GeometricWeight),
        dynamic_weighting=bool(args.dynamicWeighting),
        pn_loss=bool(args.pnloss), margin=args.D,
        hard_negatives=bool(args.hardNegatives),
        fc_weight_mode=args.fcWeightMode, fc_scale=args.fcScale,
        fc_target=args.fcTarget, w_depth=args.wDepth,
        ngf=args.ngf, base_width=args.base_width,
        internal_size=common.parse_internal_size(args.internal_size),
        feat_frozen_bn=bool(args.torch_feat_ckpt),
        dtype=jnp.bfloat16 if args.bf16 else None)

    net_f_params = None
    if args.torch_feat_ckpt:
        from relativepose_tpu.utils.torch_import import (
            import_resnet18_8s,
            load_torch_state_dict,
        )
        net_f_params = import_resnet18_8s(
            load_torch_state_dict(args.torch_feat_ckpt))
        logf("loaded frozen netF weights (torch state-dict)")
    elif args.feat_ckpt:
        from relativepose_tpu.utils.checkpoint import restore_params
        feat_state = restore_params(args.feat_ckpt)
        net_f_params = feat_state["params"]["net_f"]
        logf("loaded frozen netF weights")
    state = completion.init_state(jax.random.PRNGKey(0), cfg, net_f_params)
    parameters_count(state["params"], "netG")
    ckpt = CheckpointManager(dirs.params_dir, keep=3)
    start_epoch = 0
    if args.resume:
        state, ok = ckpt.restore_into(state)
        if ok:
            # resume the epoch counter (reference: utils/factory.py:19) —
            # otherwise the keep-N cleanup discards every new checkpoint,
            # whose restarted step numbers sort below the existing ones
            start_epoch = ckpt.all_steps()[-1]
        logf(f"resume: {'ok, from epoch %d' % start_epoch if ok else 'no checkpoint found'}")

    m = mesh.make_mesh(args.num_devices, args.model_parallel)
    state = mesh.shard_train_state(state, m, args.model_parallel > 1)
    step_jit = jax.jit(completion.make_train_step(cfg))
    eval_jit = jax.jit(lambda s, b, k: completion.loss_fn(
        s["params"], s["net_f_params"], b, k, cfg)[1])
    key = jax.random.PRNGKey(1)
    meter = AverageMeter()
    from relativepose_tpu.utils.metrics_writer import MetricsWriter
    import os as _os
    tb = MetricsWriter(_os.path.join(dirs.exp_dir, "tensorboard"))
    step_count = {"n": 0}

    def step_fn(batch, mode):
        nonlocal state, key
        key, sub = jax.random.split(key)
        batch = mesh.shard_batch(batch, m)
        if mode == "train":
            state, metrics = step_jit(state, batch, sub)
        else:
            metrics = eval_jit(state, batch, sub)
        step_count["n"] += 1
        # metric fetch = device sync; do it sparsely (see train_feature)
        if step_count["n"] % args.log_every == 0 or mode != "train":
            metrics = {k: float(v) for k, v in metrics.items()}
            meter.update(metrics["loss"])
            tb.scalars("loss", {f"{mode}_{k}": v
                                for k, v in metrics.items()},
                       step_count["n"])
            return metrics
        return {}

    train_loader, val_loader = make_loaders(args, dataset)

    def save_cb(context):
        ckpt.save(context["epoch"], jax.device_get(state))
        logf(f"epoch {context['epoch']}: checkpoint saved; "
             f"avg loss {meter.avg:.6f}")

    trainer = Trainer(
        step_fn=step_fn,
        train_loader=train_loader,
        val_loader=val_loader,
        max_epoch=args.max_epoch,
        train_duration=args.train_duration,
        epoch=start_epoch,
        callbacks=[PeriodicCallback(CallbackLoc.epoch_end,
                                    args.save_every, save_cb),
                   OnceCallback(CallbackLoc.train_end, save_cb)],
    )
    trainer.run()


if __name__ == "__main__":
    main()
