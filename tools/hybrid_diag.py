"""Hybrid-oracle diagnostic: which completed channel blocks pose recovery?

RESULTS r3 shows the fully-learned pipeline (`ours`) equal to `ours_nc` in
every bucket while the full GT oracle solves even 0-0.1-overlap pairs.
The full oracle substitutes BOTH the completed geometry (normal/depth,
used for 3-D lifts and all pairwise-consistency filters,
rpmodule.py:399-436) and the descriptors (the matching affinity,
rpmodule.py:353-374) — so it cannot say which learned channel is the
binding constraint.  This tool evaluates the standard 64-pair held-out
protocol with each channel group swapped to its oracle independently:

  combo         descriptors ('f' channels)      geometry (n/d channels)
  learned       SCNet                           SCNet
  ldesc_gtgeo   SCNet                           ground truth
  pdesc_lgeo    procedural (oracle's)           SCNet
  netf_gtgeo    netF(complete GT pano)          ground truth
  netf_lgeo     netF(complete GT pano)          SCNet

`netf_*` rows bound the best any SCNet 'f' head trained against the
feature-consistency target could do: if netf_gtgeo fails, the netF
descriptor space itself is not matchable across views at keypoints and
no amount of SCNet training can fix it.

Usage (real TPU):
    python tools/hybrid_diag.py \
        --comp_ckpt experiments/exp_comp_suncg_r3/params \
        --feat_ckpt experiments/exp_feat_suncg_r3/params \
        --n 64 --combos learned,ldesc_gtgeo,pdesc_lgeo,netf_gtgeo,netf_lgeo
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

COMBOS = ("learned", "ldesc_gtgeo", "pdesc_lgeo", "netf_gtgeo", "netf_lgeo")
# translation-triage combos (VERDICT r4 #4): ldesc_gtd / ldesc_gtn swap
# only the completed depth / only the completed normals to ground truth


def main():
    import relativepose_tpu
    relativepose_tpu.enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--comp_ckpt", type=str, required=True)
    p.add_argument("--feat_ckpt", type=str, default=None,
                   help="needed for the netf_* combos")
    p.add_argument("--family", type=str, default="suncg")
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--seed", type=int, default=20_000)
    p.add_argument("--batch_pairs", type=int, default=4)
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--combos", type=str, default=",".join(COMBOS))
    args = p.parse_args()

    from relativepose_tpu.data import datasets as dsets
    from relativepose_tpu.eval import harness
    from relativepose_tpu.models import Resnet18_8s, SCNet
    from relativepose_tpu.pipeline import PipelineConfig
    from relativepose_tpu.pipeline.oracle import make_oracle_completion_fn
    from relativepose_tpu.utils.checkpoint import CheckpointManager

    pipe_cfg = PipelineConfig(dataset=args.family)
    lay = pipe_cfg.layout
    sp = lay.spans
    f_lo, f_hi = sp["f"]
    n_lo, n_hi = sp["n"]
    d_lo, d_hi = sp["d"]

    net_g = SCNet(output_type=pipe_cfg.output_type,
                  snumclass=pipe_cfg.snumclass,
                  feature_dim=pipe_cfg.feature_dim, ngf=args.ngf,
                  dtype=jnp.bfloat16)
    from relativepose_tpu.utils.checkpoint import restore_params
    g_params = jax.device_put(restore_params(args.comp_ckpt)["params"])
    net_f = Resnet18_8s(num_input=7, feature_dim=pipe_cfg.feature_dim,
                        use_tanh=True, dtype=jnp.bfloat16)
    f_params = {}
    if args.feat_ckpt:
        f_params = jax.device_put(
            restore_params(args.feat_ckpt)["params"]["net_f"])

    def make_factory(combo: str):
        gt_geo = combo.endswith("gtgeo")
        # translation triage (VERDICT r4 #4): substitute ONE geometry
        # channel at a time — 'gtd' isolates the keypoint depth lift
        # (rputil.py:61-119), 'gtn' the normal-consistency filters and
        # the Horn normal rows (rpmodule.py:60-84,424-436)
        gt_d = gt_geo or combo.endswith("gtd")
        gt_n = gt_geo or combo.endswith("gtn")
        desc = combo.split("_")[0]  # 'learned'/'ldesc' -> SCNet f

        def factory(data_s, data_t, params):
            oracle_fn = make_oracle_completion_fn(data_s, data_t, lay)
            if desc == "netf":
                complete = jnp.stack([
                    jnp.concatenate([d["rgb"], d["norm"],
                                     d["depth"][..., None]], -1)
                    for d in (data_s, data_t)])
                netf_feat = net_f.apply(
                    {"params": params["f"]}, complete).astype(jnp.float32)

            def fn(x):
                out = net_g.apply({"params": params["g"]}, x).astype(
                    jnp.float32)
                gt = oracle_fn(x)
                if gt_n:
                    out = jnp.concatenate(
                        [out[..., :n_lo], gt[..., n_lo:n_hi],
                         out[..., n_hi:]], -1)
                if gt_d:
                    out = jnp.concatenate(
                        [out[..., :d_lo], gt[..., d_lo:d_hi],
                         out[..., d_hi:]], -1)
                if desc == "pdesc":
                    out = jnp.concatenate(
                        [out[..., :f_lo], gt[..., f_lo:f_hi],
                         out[..., f_hi:]], -1)
                elif desc == "netf":
                    out = jnp.concatenate(
                        [out[..., :f_lo], netf_feat, out[..., f_hi:]], -1)
                return out
            return fn
        return factory

    results = {}
    for combo in args.combos.split(","):
        cfg = harness.EvalConfig(
            dataset=args.family, method="ours", exp=f"hybrid_{combo}",
            out_dir="tmp/hybrid_diag", max_iter=args.n,
            batch_pairs=args.batch_pairs, resume=False)
        eval_fn_jit = jax.jit(harness.make_batched_eval_fn(
            make_factory(combo), cfg, pipe_cfg))
        # the scalar-default sigma rows, matching cli.evaluate's no---para
        # behavior so rows are comparable with RESULTS.md
        hp = harness.hyper_params_from_table(
            np.tile([0.2615, 0.2615, 0.04, 0.01], (3, 1)),
            alter_steps=pipe_cfg.alter_steps)
        params = {"g": g_params, "f": f_params}

        def eval_fn(ds, dt, T_gt, keys):
            return eval_fn_jit(ds, dt, T_gt, keys, params, hp)

        src = dsets.SyntheticPairs(args.family, n=args.n, seed=args.seed)
        runner = harness.evaluate_stream(
            lambda: dsets.batched(src, args.batch_pairs, max_items=args.n),
            eval_fn, cfg)
        s = runner.summary()
        s["combo"] = combo
        results[combo] = s
        print(json.dumps(s), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
