"""Sigma-hyperparameter trainer (mirrors trainRelativePoseModuleRecFD.py).

Caches matching primitives by running the recurrent pipeline once per pair
(per recurrence level), then optimizes the 4 matching sigmas per level with
randomized finite differences + line search, writing a sigma table in the
same format as data/relativePoseModule/final_param_*_rlevel_3.txt.

Usage (synthetic scenes, oracle completion):
    python -m relativepose_tpu.cli.tune_sigma --dataList synthetic \
        --synthetic_family suncg --num_pairs 20 --rlevel 3 \
        --out experiments/sigma_suncg.txt
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from relativepose_tpu import config
from relativepose_tpu.data import datasets as dsets
from relativepose_tpu.match.keypoints import KeypointConfig
from relativepose_tpu.match.solver import SolverHyperParams, SolverStaticConfig
from relativepose_tpu.pipeline import PipelineConfig
from relativepose_tpu.tune import sigma as st


def main(argv=None):
    import relativepose_tpu
    relativepose_tpu.enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataList", type=str, default="synthetic")
    p.add_argument("--listPath", type=str, default=None)
    p.add_argument("--synthetic_family", type=str, default="suncg")
    p.add_argument("--num_pairs", type=int, default=30)
    p.add_argument("--rlevel", type=int, default=3)
    p.add_argument("--max_iter", type=int, default=30)
    p.add_argument("--outputType", type=str, default="rgbdnsf")
    p.add_argument("--featureDim", type=int, default=32)
    p.add_argument("--comp_ckpt", type=str, default=None)
    p.add_argument("--ngf", type=int, default=64,
                   help="SCNet width (must match the checkpoint)")
    p.add_argument("--skipLayer", type=int, default=1)
    p.add_argument("--batchnorm", type=int, default=1)
    p.add_argument("--cache", type=str, default=None,
                   help="primitive cache .npy (created if missing)")
    p.add_argument("--tune_method", type=str, default="grad",
                   choices=["grad", "fd"],
                   help="'grad' = exact jax.grad Adam on log-sigma; 'fd' "
                        "= the reference's randomized finite differences "
                        "(trainRelativePoseModuleRecFD.py:245-298)")
    p.add_argument("--val_frac", type=float, default=0.25,
                   help="held-out pair fraction per level; tuned rows are "
                        "shipped only if they beat the defaults there")
    p.add_argument("--grad_steps", type=int, default=150)
    p.add_argument("--grad_lr", type=float, default=0.03)
    p.add_argument("--out", type=str, required=True,
                   help="output sigma table txt")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scene_seed", type=int, default=0,
                   help="synthetic scene seed for the tuning pairs")
    p.add_argument("--ramp_weight", type=float, default=0.35,
                   help="v4 scene knob (see cli.common)")
    p.add_argument("--n_clutter", type=int, default=0)
    args = p.parse_args(argv)

    family = (args.synthetic_family if "synthetic" in args.dataList
              else config.canonical_dataset(args.dataList))
    snumclass = config.NUM_CLASSES[family]
    pipe_cfg = PipelineConfig(
        dataset=family,
        mask_method="kinect" if family == "scannet" else "second",
        alter_steps=args.rlevel, snumclass=snumclass,
        feature_dim=args.featureDim, output_type=args.outputType,
        keypoints=KeypointConfig())

    if args.cache and os.path.exists(args.cache):
        blob = np.load(args.cache, allow_pickle=True).item()
        by_level, rgt = blob["primitives"], blob["R_gt"]
        print(f"loaded primitive cache {args.cache}")
    else:
        from relativepose_tpu.cli.evaluate import (
            scnet_fn_factory_from_checkpoint,
        )
        args.snumclass = snumclass
        args.useTanh = 1
        args.bf16 = 1
        factory, scnet_params = scnet_fn_factory_from_checkpoint(
            args, pipe_cfg.layout)
        if "synthetic" in args.dataList:
            source = dsets.SyntheticPairs(
                family, n=args.num_pairs, seed=args.scene_seed,
                ramp_weight=args.ramp_weight, n_clutter=args.n_clutter)
        else:
            source = dsets.PanoPairDataset(family, "train", args.listPath)

        def pairs():
            for i in range(min(len(source), args.num_pairs)):
                it = source[i]
                to_jax = lambda d: {k: jnp.asarray(v) for k, v in d.items()
                                    if k != "pose"}
                yield (to_jax(it["data_s"]), to_jax(it["data_t"]),
                       jnp.asarray(it["T_gt"]))

        by_level, rgt = st.cache_primitives(
            factory, pairs(), SolverHyperParams(), pipe_cfg,
            key=jax.random.PRNGKey(args.seed), cache_path=args.cache,
            scnet_params=scnet_params)
        print(f"cached primitives for {len(by_level[0])} pairs x "
              f"{len(by_level)} levels")

    # the exact-gradient path differentiates the solver: Pallas kernels
    # have no autodiff rule, so the objective uses the XLA W build
    solver_cfg = SolverStaticConfig(
        pallas_w_build=args.tune_method != "grad", use_pallas=False)
    table = st.tune_per_level(
        by_level, rgt,
        fd=st.FDConfig(max_iter=args.max_iter, seed=args.seed),
        cfg=solver_cfg, method=args.tune_method,
        val_frac=args.val_frac, grad_steps=args.grad_steps,
        grad_lr=args.grad_lr)
    np.savetxt(args.out, table)
    print(f"wrote sigma table {args.out}:\n{table}")
    return table


if __name__ == "__main__":
    main()
