"""Learned-vs-classical-SIFT descriptor comparison curves.

Re-creates the reference's feature-eval comparison
(mainFeatureLearning.py:284-321: `evalDLDescriptor` vs
`evalSiftDescriptor`): ranking-ratio distributions of the learned netF
descriptors (split obs/unobs) against classical SIFT descriptors computed
at the same GT correspondences, on held-out synthetic pairs.  Writes a
cumulative-curve PNG + one JSON line of means.

Usage (real TPU for the netF forward; SIFT runs on host):
    python tools/descriptor_compare.py \
        --feat_ckpt experiments/exp_feat_suncg_r4/params --n 16
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
    p.add_argument("--feat_ckpt", type=str, required=True)
    p.add_argument("--family", type=str, default="suncg")
    p.add_argument("--n", type=int, default=16)
    p.add_argument("--seed", type=int, default=20_000,
                   help="held-out scene seed")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--sample", type=int, default=100)
    p.add_argument("--out", type=str, default="tmp/descriptor_compare")
    p.add_argument("--bf16", type=int, default=1)
    args = p.parse_args()

    from relativepose_tpu.core import masking
    from relativepose_tpu.data import datasets as dsets
    from relativepose_tpu.data.device_store import DeviceStore, gather_batch
    from relativepose_tpu.eval import descriptor_eval
    from relativepose_tpu.models import Resnet18_8s
    from relativepose_tpu.utils import plot as uplot
    from relativepose_tpu.utils.checkpoint import CheckpointManager

    dtype = jnp.bfloat16 if args.bf16 else None
    net_f = Resnet18_8s(num_input=7, feature_dim=32, use_tanh=True,
                        dtype=dtype)
    from relativepose_tpu.utils.checkpoint import restore_params
    feat_params = jax.device_put(
        restore_params(args.feat_ckpt)["params"]["net_f"])

    src = dsets.SyntheticPairs(args.family, n=args.n, seed=args.seed)
    store = DeviceStore(src)
    mask_method = "kinect" if args.family == "scannet" else "second"

    @jax.jit
    def run(arrays, params, idx, keys):
        b = gather_batch(arrays, idx, keys, args.family, True)
        n = b["rgb"].shape[0]
        pack = lambda v: jnp.concatenate([b[v][:, 0], b[v][:, 1]], axis=0)
        complete = jnp.concatenate(
            [pack("rgb"), pack("norm"), pack("depth")[..., None]], axis=-1)
        feat = net_f.apply({"params": params}, complete).astype(jnp.float32)
        obs_mask, _ = masking.observation_mask(mask_method)
        ratios, valid = descriptor_eval.ranking_ratio(
            feat[:n], feat[n:], b["denseCorres"]["idx_src"],
            b["denseCorres"]["idx_tgt"], b["denseCorres"]["valid"],
            sample=args.sample, key=keys[0])
        return (b["rgb"], b["denseCorres"]["idx_src"],
                b["denseCorres"]["idx_tgt"], b["denseCorres"]["valid"],
                ratios)

    learned, sift = [], []
    key = jax.random.PRNGKey(5)
    for lo in range(0, store.n - args.batch + 1, args.batch):
        idx = jnp.arange(lo, lo + args.batch, dtype=jnp.int32)
        key, k = jax.random.split(key)
        rgb, i_s, i_t, valid, ratios = jax.device_get(
            run(store.arrays, feat_params, idx,
                jax.random.split(k, args.batch)))
        for j in range(args.batch):
            if valid[j]:
                learned.append(float(np.mean(ratios[j])))
        sift.extend(descriptor_eval.sift_ranking_ratio(
            rgb[:, 0], rgb[:, 1], i_s, i_t, valid, sample=args.sample,
            seed=lo))

    os.makedirs(args.out, exist_ok=True)
    img = uplot.plot_cumulative(
        [np.asarray(learned), np.asarray(sift)],
        labels=["learned (netF)", "SIFT"],
        title=f"descriptor ranking ratio, {args.family} held-out",
        xlabel="ranking ratio (lower is better)")
    import cv2
    png = os.path.join(args.out, f"ranking_{args.family}.png")
    cv2.imwrite(png, img[..., ::-1])
    result = {
        "family": args.family, "n_pairs": len(learned),
        "learned_mean_ratio": round(float(np.mean(learned)), 5),
        "sift_mean_ratio": round(float(np.mean(sift)), 5),
        "curve_png": png, "feat_ckpt": args.feat_ckpt,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
