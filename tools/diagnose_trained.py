"""Diagnose trained checkpoints: descriptor + completion quality curves.

The reference tracks these during training (so a failing stage is
identified, not guessed):
  * descriptor ranking-ratio curves for the feature net
    (mainFeatureLearning.py:293-375): fraction of pano locations closer
    to a query descriptor than its true match — 0 is perfect, 0.5 is
    chance, split by observed/unobserved endpoints;
  * completion normal-angle / depth-L1 / rgb-L1 curves for SCNet
    (mainPanoCompletion2view.py:324-350), split observed vs hallucinated
    regions;
  * ranking-ratio of the COMPLETED feature channels against netF on the
    complete pano — the quantity that decides whether keypoints in
    hallucinated regions can be matched at all.

Usage (real TPU):
    python tools/diagnose_trained.py \
        --feat_ckpt experiments/exp_feat_suncg_r3/params \
        --comp_ckpt experiments/exp_comp_suncg_r3/params --n 32

Prints one JSON line; append-friendly for docs/TRAINING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import relativepose_tpu
    relativepose_tpu.enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--feat_ckpt", type=str, default=None)
    p.add_argument("--comp_ckpt", type=str, default=None)
    p.add_argument("--family", type=str, default="suncg")
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--seed", type=int, default=10_000,
                   help="held-out scene seed (val=10000, eval=20000)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--base_width", type=int, default=64)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--ramp_weight", type=float, default=0.35,
                   help="v4 scene knob — diagnose on the same scene "
                        "distribution the checkpoint was trained for")
    p.add_argument("--n_clutter", type=int, default=0)
    p.add_argument("--internal_size", type=str, default="224x224",
                   help="SCNet bottleneck size the checkpoint was "
                        "trained at (HxW)")
    args = p.parse_args()

    from relativepose_tpu.core import masking
    from relativepose_tpu.data import datasets as dsets
    from relativepose_tpu.data.device_store import DeviceStore, gather_batch
    from relativepose_tpu.eval import descriptor_eval
    from relativepose_tpu.models import Resnet18_8s, SCNet
    from relativepose_tpu.train.completion import CompletionTrainConfig
    from relativepose_tpu.utils.checkpoint import CheckpointManager

    from relativepose_tpu import config as rp_config
    dtype = jnp.bfloat16 if args.bf16 else None
    cfg = CompletionTrainConfig(
        dataset=args.family,
        mask_method="kinect" if args.family == "scannet" else "second",
        snumclass=rp_config.NUM_CLASSES[args.family],
        ngf=args.ngf, base_width=args.base_width, dtype=dtype)
    lay = cfg.layout
    f_lo, f_hi = lay.spans["f"]

    net_f = Resnet18_8s(num_input=7, feature_dim=cfg.feature_dim,
                        use_tanh=cfg.use_tanh, base_width=cfg.base_width,
                        dtype=dtype)
    from relativepose_tpu.utils.checkpoint import restore_params
    feat_params = None
    if args.feat_ckpt:
        st = restore_params(args.feat_ckpt)
        feat_params = jax.device_put(st["params"]["net_f"])
    net_g = g_params = None
    if args.comp_ckpt:
        st = restore_params(args.comp_ckpt)
        g_params = jax.device_put(st["params"])
        from relativepose_tpu.cli.common import parse_internal_size
        net_g = SCNet(output_type=cfg.output_type, snumclass=cfg.snumclass,
                      feature_dim=cfg.feature_dim, ngf=cfg.ngf,
                      internal_size=parse_internal_size(args.internal_size),
                      dtype=dtype)

    src = dsets.SyntheticPairs(args.family, n=args.n, seed=args.seed,
                               ramp_weight=args.ramp_weight,
                               n_clutter=args.n_clutter)
    store = DeviceStore(src)

    @jax.jit
    def metrics_for(arrays, feat_params, g_params, idx, keys):
        b = gather_batch(arrays, idx, keys, args.family, True)
        n = b["rgb"].shape[0]
        pack = lambda v: jnp.concatenate([b[v][:, 0], b[v][:, 1]], axis=0)
        complete = jnp.concatenate(
            [pack("rgb"), pack("norm"), pack("depth")[..., None]], axis=-1)
        view, obs_mask, _ = masking.apply_mask(
            complete, cfg.mask_method, variant="train")
        data_mask = pack("dataMask")
        out = {}

        if feat_params is not None:
            feat = net_f.apply({"params": feat_params}, complete).astype(
                jnp.float32)
            ratios, vmask = descriptor_eval.ranking_ratio(
                feat[:n], feat[n:], b["denseCorres"]["idx_src"],
                b["denseCorres"]["idx_tgt"], b["denseCorres"]["valid"],
                key=keys[0])
            w = vmask.astype(jnp.float32)[:, None]
            out["netF_ranking_ratio"] = (jnp.sum(ratios * w)
                                         / jnp.maximum(jnp.sum(w)
                                                       * ratios.shape[1], 1))
        if g_params is not None:
            view8 = jnp.concatenate([view, obs_mask[..., :1]], axis=-1)
            inp = jnp.concatenate([view8, jnp.zeros_like(view8)], axis=-1)
            fake = net_g.apply({"params": g_params}, inp).astype(jnp.float32)
            halluc = data_mask * (1.0 - obs_mask[..., :1])  # unobserved
            obs_w = data_mask * obs_mask[..., :1]

            def region_mean(x, w):
                return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)

            sp = lay.spans
            nrm = fake[..., sp["n"][0]:sp["n"][1]]
            nrm = nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True)
                         + 1e-12)
            cosang = jnp.clip(jnp.sum(nrm * complete[..., 3:6], -1),
                              -1.0, 1.0)
            ang = jnp.degrees(jnp.arccos(cosang))[..., None]
            d_l1 = jnp.abs(fake[..., sp["d"][0]:sp["d"][1]]
                           - complete[..., 6:7])
            rgb_l1 = jnp.mean(jnp.abs(fake[..., sp["rgb"][0]:sp["rgb"][1]]
                                      - complete[..., 0:3]), -1,
                              keepdims=True)
            for name, x in (("normal_angle_deg", ang), ("depth_l1", d_l1),
                            ("rgb_l1", rgb_l1)):
                out[f"scnet_{name}_halluc"] = region_mean(x, halluc)
                out[f"scnet_{name}_obs"] = region_mean(x, obs_w)

            # matchability of hallucinated descriptors: completed features
            # of view 0 vs view 1 at GT correspondences
            featc = fake[..., f_lo:f_hi]
            ratios_c, vmask_c = descriptor_eval.ranking_ratio(
                featc[:n], featc[n:], b["denseCorres"]["idx_src"],
                b["denseCorres"]["idx_tgt"], b["denseCorres"]["valid"],
                key=keys[1])
            w = vmask_c.astype(jnp.float32)[:, None]
            out["scnet_feat_ranking_ratio"] = (
                jnp.sum(ratios_c * w)
                / jnp.maximum(jnp.sum(w) * ratios_c.shape[1], 1))
        return out

    sums = {}
    counts = 0
    key = jax.random.PRNGKey(123)
    for lo in range(0, store.n, args.batch):
        idx = jnp.arange(lo, min(lo + args.batch, store.n), dtype=jnp.int32)
        if len(idx) < args.batch:
            break
        key, k = jax.random.split(key)
        out = jax.device_get(metrics_for(
            store.arrays, feat_params, g_params, idx,
            jax.random.split(k, len(idx))))
        for kk, v in out.items():
            sums[kk] = sums.get(kk, 0.0) + float(v)
        counts += 1
    result = {k: round(v / max(counts, 1), 4) for k, v in sums.items()}
    result["n_pairs"] = counts * args.batch
    result["feat_ckpt"] = args.feat_ckpt
    result["comp_ckpt"] = args.comp_ckpt
    print(json.dumps(result))


if __name__ == "__main__":
    main()
