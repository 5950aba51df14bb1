"""Feature-network training driver (mirrors mainFeatureLearning.py).

Usage:
    python -m relativepose_tpu.cli.train_feature --exp feat_suncg \
        --dataList synthetic --synthetic_family suncg --featurelearning 1

Real datasets: pass --dataList suncgv3 --listPath data/dataList/suncgv3.npy
with the reference's on-disk layout.
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from relativepose_tpu.cli.common import add_common_training_args, resolve_dataset
from relativepose_tpu.data import datasets as dsets
from relativepose_tpu.data import pipeline as dpipe
from relativepose_tpu.train import feature, mesh
from relativepose_tpu.utils.checkpoint import CheckpointManager
from relativepose_tpu.utils.experiment import ExperimentDirs, parameters_count
from relativepose_tpu.utils.log import AverageMeter, FileLogger
from relativepose_tpu.utils.trainer import Trainer


def make_source(args, split: str, dataset: str):
    if "synthetic" in args.dataList:
        if args.debug:
            n = 64
        else:
            n = getattr(args, "synthetic_n", None) or 2048
            if split != "train":
                n = max(64, n // 8)
        from relativepose_tpu.cli.common import synthetic_scene_kwargs
        return dsets.SyntheticPairs(
            dataset, n=n, seed=0 if split == "train" else 10_000,
            view_detail_jitter=bool(getattr(args, "view_detail_jitter", 0)),
            full_frames=False,  # train steps never read the kinect frames
            **synthetic_scene_kwargs(args))
    return dsets.PanoPairDataset(dataset, split, args.listPath)


def batch_iterator(source, args, dataset: str, key_seed: int):
    """Host loader -> device-side sample assembly (denseCorres on TPU).

    Host->device transfers ride a ~25 MB/s tunnel on this environment, so
    pano batches are shipped in the reference's own on-disk precision —
    rgb uint8 (png), normals int8 ((v/255)*2-1 pngs), depth uint16
    millimeters (exactly the reference's depth png contract, SUNCG.py:83)
    — and decoded to f32 on device: ~52 MB -> ~14 MB per batch-8 step.

    This is the streaming path for real on-disk datasets; synthetic
    training uses the HBM-resident store (data/device_store.py) instead,
    which eliminates per-step host traffic entirely.
    """
    rng = np.random.RandomState(key_seed)

    @functools.partial(jax.jit, static_argnames=())
    def assemble(rgb_u8, norm_i8, depth_u16, poses, segm_u8, key):
        rgb = rgb_u8.astype(jnp.float32) / 255.0
        norm = norm_i8.astype(jnp.float32) / 127.0
        depth = depth_u16.astype(jnp.float32) / 1000.0
        segm = segm_u8.astype(jnp.int32)
        return jax.vmap(
            lambda r, n, d, p, s, k: dpipe.assemble_pair_batch(
                r, n, d, p, s, k, dataset, feature_learning=True)
        )(rgb, norm, depth, poses, segm, key)

    def gen():
        order = rng.permutation(len(source))
        buf = []
        for i in order:
            item = source[int(i)]
            buf.append(item)
            if len(buf) == args.batch_size:
                def stack(f, enc):
                    return jnp.asarray(np.stack(
                        [np.stack([enc(b["data_s"][f]), enc(b["data_t"][f])])
                         for b in buf]))
                enc_rgb = lambda a: np.clip(
                    np.asarray(a) * 255.0 + 0.5, 0, 255).astype(np.uint8)
                enc_norm = lambda a: np.clip(
                    np.round(np.asarray(a) * 127.0), -127, 127).astype(np.int8)
                enc_depth = lambda a: np.clip(
                    np.round(np.asarray(a) * 1000.0), 0, 65535
                ).astype(np.uint16)
                enc_segm = lambda a: np.asarray(a, np.uint8)
                keys = jax.random.split(
                    jax.random.PRNGKey(rng.randint(2**31)), len(buf))
                yield assemble(stack("rgb", enc_rgb), stack("norm", enc_norm),
                               stack("depth", enc_depth),
                               jnp.asarray(np.stack(
                                   [np.stack([b["data_s"]["pose"],
                                              b["data_t"]["pose"]])
                                    for b in buf])).astype(jnp.float32),
                               stack("segm", enc_segm), keys)
                buf = []

    class _Loader:
        def __iter__(self):
            # Host-side prefetch (the reference's DataLoader(num_workers=8),
            # opts.py:42-45): a daemon thread runs the host decode/stack and
            # the async device dispatch one batch ahead, so host prep
            # overlaps device compute even on this 1-core box.
            import queue
            import threading

            q = queue.Queue(maxsize=2)
            _END = object()

            def worker():
                try:
                    for b in gen():
                        q.put(b)
                except BaseException as e:  # surface in the consumer
                    q.put(e)
                finally:
                    q.put(_END)

            threading.Thread(target=worker, daemon=True).start()
            while True:
                item = q.get()
                if item is _END:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item

    return _Loader()


def make_loaders(args, dataset: str):
    """(train_loader, val_loader): HBM-resident for synthetic sets (whole
    set uploaded once, batches gathered + augmented on device each step),
    streaming batch_iterator for real on-disk datasets or --device_data 0."""
    train_src = make_source(args, "train", dataset)
    val_src = make_source(args, "test", dataset)
    if getattr(args, "device_data", 1) and "synthetic" in args.dataList:
        from relativepose_tpu.data.device_store import (
            DeviceStore,
            ResidentLoader,
        )
        # training steps never read the scannet full frames; keep them out
        # of HBM (they double a 2048-pair scannet store's footprint)
        tr_store = DeviceStore(train_src, log=print, with_full_frames=False)
        va_store = DeviceStore(val_src, log=print, with_full_frames=False)
        return (ResidentLoader(tr_store, args.batch_size, dataset, seed=0),
                ResidentLoader(va_store, args.batch_size, dataset, seed=1))
    return (batch_iterator(train_src, args, dataset, 0),
            batch_iterator(val_src, args, dataset, 1))


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
    p.add_argument("--device_data", type=int, default=1,
                   help="keep the synthetic set HBM-resident (0 = stream)")
    p.add_argument("--log_every", type=int, default=10,
                   help="host metric fetch cadence (each fetch syncs)")
    args = p.parse_args(argv)
    dataset, mask_method = resolve_dataset(args)

    dirs = ExperimentDirs(args.exp, rm=args.rm, resume=args.resume)
    logf = FileLogger(dirs.log_path)
    cfg = feature.FeatureTrainConfig(
        snumclass=args.snumclass, feature_dim=args.featureDim,
        use_tanh=bool(args.useTanh), margin=args.D,
        hard_negatives=bool(args.hardNegatives),
        featlearn_segm=bool(getattr(args, "featlearnSegm", 0)),
        base_width=args.base_width,
        dtype=jnp.bfloat16 if args.bf16 else None)

    state = feature.init_state(jax.random.PRNGKey(0), cfg)
    parameters_count(state["params"]["net_f"], "netF")
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
    step_jit = jax.jit(feature.make_train_step(cfg))
    eval_jit = jax.jit(
        lambda params, batch, k: feature.loss_fn(params, batch, k, cfg)[1])
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
            metrics = eval_jit(state["params"], batch, sub)
        step_count["n"] += 1
        # Fetch metrics to host only every log_every steps: each float()
        # is a device sync over the tunnel; in between, steps are enqueued
        # asynchronously so the chip never waits on the host.
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
        logf(f"epoch {context['epoch']}: saved checkpoint; "
             f"avg loss {meter.avg:.6f}")

    from relativepose_tpu.utils.callbacks import (
    CallbackLoc,
    OnceCallback,
    PeriodicCallback,
)
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
