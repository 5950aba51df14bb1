"""Evaluation driver (mirrors evaluation.py).

Usage (synthetic scenes, oracle completion):
    python -m relativepose_tpu.cli.evaluate --dataList synthetic \
        --synthetic_family suncg --method ours --maxIter 100

With a trained completion checkpoint:
    python -m relativepose_tpu.cli.evaluate --dataList suncgv3 \
        --listPath data/dataList/suncgv3.npy --method ours \
        --comp_ckpt experiments/exp_comp_suncg/params --para <sigma.txt>
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from relativepose_tpu import config
from relativepose_tpu.config import ChannelLayout
from relativepose_tpu.data import datasets as dsets
from relativepose_tpu.eval import harness
from relativepose_tpu.match.keypoints import KeypointConfig
from relativepose_tpu.match.solver import SolverStaticConfig
from relativepose_tpu.pipeline import PipelineConfig


def _parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataList", type=str, default="matterport3dv1")
    p.add_argument("--listPath", type=str, default=None)
    p.add_argument("--synthetic_family", type=str, default="suncg")
    p.add_argument("--method", type=str, default="ours",
                   choices=["ours", "ours_nc", "ours_nr", "super4pcs",
                            "fgs", "gs", "cgs"])
    p.add_argument("--sigmaDist", type=float, default=0.04)
    p.add_argument("--sigmaAngle1", type=float, default=0.2615)
    p.add_argument("--sigmaAngle2", type=float, default=0.2615)
    p.add_argument("--sigmaFeat", type=float, default=0.01)
    p.add_argument("--para", type=str, default=None,
                   help="sigma table txt (rows per recurrence step)")
    p.add_argument("--maxIter", type=int, default=1000)
    p.add_argument("--num_repeat", type=int, default=1)
    p.add_argument("--outputType", type=str, default="rgbdnsf")
    p.add_argument("--snumclass", type=int, default=None)
    p.add_argument("--featureDim", type=int, default=32)
    p.add_argument("--maskMethod", type=str, default="second")
    p.add_argument("--exp", type=str, default="eval")
    p.add_argument("--rm", action="store_true")
    p.add_argument("--entrySplit", type=int, default=None)
    p.add_argument("--batch_pairs", type=int, default=4)
    p.add_argument("--comp_ckpt", type=str, default=None)
    p.add_argument("--torch_comp_ckpt", type=str, default=None,
                   help="reference SCNet state-dict (.pth.tar) — converted "
                        "on load via utils.torch_import (evaluation.py:"
                        "143-154's <ds>.comp.pth.tar)")
    p.add_argument("--eval_seed", type=int, default=20_000,
                   help="synthetic eval scene seed (train=0, val=10000 "
                        "are reserved by the training CLIs)")
    p.add_argument("--ramp_weight", type=float, default=0.35,
                   help="v4 scene knob: position-ramp coefficient of the "
                        "synthetic texture (0.35 = v3; 0 = no globally "
                        "localizing paint)")
    p.add_argument("--n_clutter", type=int, default=0,
                   help="v4 scene knob: interior occluders per room")
    p.add_argument("--alterStep", type=int, default=None,
                   help="recurrence depth override (the reference's "
                        "--alterStep, evaluation.py:56,73; default: 3 "
                        "for ours, 1 for ours_nr)")
    p.add_argument("--per_step_errors", type=int, default=0,
                   help="also record the pose error after each recurrence "
                        "step (rot_step_i / trans_step_i columns)")
    p.add_argument("--step_select", type=str, default="last",
                   choices=["last", "best_score"],
                   help="'last' = reference semantics; 'best_score' "
                        "returns the recurrence step with the highest "
                        "solver inlier rate (round-5 alternation triage)")
    p.add_argument("--min_score", type=float, default=0.0,
                   help="with best_score: identity pose when even the "
                        "best step's inlier rate is below this")
    p.add_argument("--refit", type=int, default=0,
                   help="tight-sigma Gaussian inlier-refit rounds after "
                        "the solver fit (SolverStaticConfig.refit_rounds; "
                        "0 = reference semantics).  Targets translation: "
                        "the reference's meter-scale IRLS sigma leaves "
                        "t exposed to sub-meter position outliers")
    p.add_argument("--trans_refine", type=int, default=0,
                   help="robust translation re-aggregation rounds: keep "
                        "the fitted R fixed and IRLS (Geman-McClure, "
                        "sigma=0.1 m) the per-correspondence translation "
                        "votes pt - R ps (SolverStaticConfig."
                        "trans_refine_rounds; 0 = reference semantics)")
    p.add_argument("--icp", type=int, default=0,
                   help="dense projective point-to-plane ICP polish "
                        "iterations per recurrence step (ops/icp.py; "
                        "0 = reference semantics)")
    p.add_argument("--icp_dof", type=int, default=6, choices=(3, 6),
                   help="3 = translation-only polish (solver rotation "
                        "kept fixed)")
    p.add_argument("--n_detect", type=int, default=None,
                   help="detector keypoint capacity per view "
                        "(default: KeypointConfig.n_detect)")
    p.add_argument("--dog_threshold", type=float, default=None,
                   help="DoG response threshold on 0..255 luma")
    p.add_argument("--ngf", type=int, default=64,
                   help="SCNet width (must match the checkpoint)")
    p.add_argument("--internal_size", type=str, default="224x224",
                   help="SCNet internal resolution HxW (must match the "
                        "checkpoint; VERDICT r4 #6 throughput knob)")
    p.add_argument("--bf16", type=int, default=1)
    # reference model-shape flags (evaluation.py:62-65)
    p.add_argument("--skipLayer", type=int, default=1,
                   help="skip connections in the completion net")
    p.add_argument("--useTanh", type=int, default=1,
                   help="tanh on the feature-map head")
    p.add_argument("--batchnorm", type=int, default=1,
                   help="batch norm in the completion net")
    p.add_argument("--representation", type=str, default="skybox",
                   choices=["skybox"])
    p.add_argument("--saveCompletion", type=int, default=1,
                   help="accepted for parity (unused in the reference too, "
                        "evaluation.py:63)")
    p.add_argument("--force_cpu", type=int, default=1,
                   help="classical methods only: run the jax bookkeeping "
                        "ops on host CPU instead of the TPU tunnel")
    p.add_argument("--debug", action="store_true")
    p.add_argument("-l", "--log", dest="log", type=str, default="WARNING",
                   help="python logging level (evaluation.py:69)")
    args = p.parse_args(argv)
    import logging
    logging.basicConfig(level=getattr(logging, args.log.upper(), 30))
    if "synthetic" in args.dataList:
        args.family = args.synthetic_family
    else:
        args.family = config.canonical_dataset(args.dataList)
    if args.snumclass is None:
        args.snumclass = config.NUM_CLASSES[args.family]  # evaluation.py:75
    if args.family == "scannet":
        args.maskMethod = "kinect"
    return args


def scnet_fn_factory_from_checkpoint(args, layout: ChannelLayout):
    """Completion net for the eval pipeline; falls back to the GT oracle
    when no checkpoint is given (synthetic runs).  Accepts either an orbax
    checkpoint dir (--comp_ckpt) or a reference torch state-dict
    (--torch_comp_ckpt, converted in place).

    Returns (factory, params): factory(data_s, data_t, params) -> scnet_fn.
    Params are threaded through as a jit ARGUMENT rather than closed over —
    closure params are baked into the HLO as 30M-element constants, which
    made the trained-SCNet graph compile ~10x slower than the oracle graph
    (507 s vs 47 s, RESULTS r2) and defeats the persistent compile cache
    (every checkpoint would hash to a different module)."""
    if args.comp_ckpt or getattr(args, "torch_comp_ckpt", None):
        from relativepose_tpu.models import SCNet
        if getattr(args, "torch_comp_ckpt", None):
            from relativepose_tpu.utils.torch_import import (
                import_scnet,
                load_torch_state_dict,
            )
            sd = load_torch_state_dict(args.torch_comp_ckpt)
            params = import_scnet(sd, output_type=args.outputType,
                                  batchnorm=bool(args.batchnorm))
        else:
            from relativepose_tpu.utils.checkpoint import restore_params
            params = restore_params(args.comp_ckpt)["params"]
        # orbax/torch restore yields HOST numpy arrays; as jit arguments
        # they would be re-uploaded over the tunnel EVERY call (measured
        # 4.1 s vs 34 ms per SCNet forward).  Pin them in HBM once.
        params = jax.device_put(params)
        from relativepose_tpu.cli.common import parse_internal_size
        net = SCNet(output_type=args.outputType, snumclass=args.snumclass,
                    feature_dim=args.featureDim, ngf=args.ngf,
                    internal_size=parse_internal_size(
                        getattr(args, "internal_size", "224x224")),
                    batchnorm=bool(args.batchnorm),
                    skip_layer=bool(args.skipLayer),
                    use_tanh=bool(args.useTanh),
                    dtype=jnp.bfloat16 if args.bf16 else None)

        def factory(data_s, data_t, p):
            def fn(x):
                return net.apply({"params": p}, x).astype(jnp.float32)
            return fn

        return factory, params

    from relativepose_tpu.pipeline.oracle import make_oracle_completion_fn

    def factory(data_s, data_t, p):
        return make_oracle_completion_fn(data_s, data_t, layout)

    return factory, {}


def main(argv=None):
    import relativepose_tpu
    relativepose_tpu.enable_compile_cache()
    args = _parse_args(argv)
    sigma_table = np.loadtxt(args.para).reshape(-1, 4) if args.para else \
        np.tile([args.sigmaAngle1, args.sigmaAngle2, args.sigmaDist,
                 args.sigmaFeat], (3, 1))
    cfg = harness.EvalConfig(
        dataset=args.family, method=args.method, exp=args.exp,
        max_iter=args.maxIter, num_repeat=args.num_repeat,
        batch_pairs=args.batch_pairs, resume=not args.rm,
        sigma_table=sigma_table,
        per_step_errors=bool(args.per_step_errors),
        alter_steps_override=args.alterStep)

    if args.method in harness.CLASSICAL_METHODS:
        if args.force_cpu:
            # the classical methods are host C++; keeping the bookkeeping
            # ops (parse/overlap) off the TPU avoids per-pair tunnel
            # dispatch latency dominating the run.  The platform switch
            # only takes effect if no backend is initialized yet (ADVICE
            # r4: in-process callers that already ran TPU rows get a
            # silent no-op) — detect and warn so multi-row drivers run
            # classical rows in a subprocess instead.
            # NOTE: jax.extend.backend.backends() would itself initialize
            # the backend — inspect the registry without triggering it
            from jax._src import xla_bridge as _xb
            already = getattr(_xb, "_backends", None)
            if already:
                print("warning: JAX backend already initialized; "
                      "--force_cpu has no effect in this process (run "
                      "classical rows in a fresh process)")
            else:
                jax.config.update("jax_platforms", "cpu")
        from relativepose_tpu.eval import baselines
        runner = baselines.run_classical_eval(args, cfg)
        print(json.dumps(runner.summary()))
        return runner

    pipe_cfg = PipelineConfig(
        dataset=args.family, mask_method=args.maskMethod,
        alter_steps=cfg.alter_steps, completion=cfg.completion,
        output_type=args.outputType, snumclass=args.snumclass,
        step_select=args.step_select, min_score=args.min_score,
        icp_iters=args.icp, icp_dof=args.icp_dof,
        solver=SolverStaticConfig(refit_rounds=args.refit,
                                  trans_refine_rounds=args.trans_refine),
        feature_dim=args.featureDim, keypoints=KeypointConfig(
            **{k: v for k, v in (("n_detect", args.n_detect),
                                 ("dog_threshold", args.dog_threshold))
               if v is not None}))
    layout = pipe_cfg.layout
    factory, scnet_params = scnet_fn_factory_from_checkpoint(args, layout)
    eval_fn_jit = jax.jit(harness.make_batched_eval_fn(factory, cfg,
                                                       pipe_cfg))
    hp = harness.hyper_params_from_table(
        cfg.sigma_table if cfg.sigma_table is not None
        else harness.default_sigma_table(cfg.dataset),
        alter_steps=cfg.alter_steps)

    def eval_fn(data_s, data_t, T_gt, keys):
        return eval_fn_jit(data_s, data_t, T_gt, keys, scnet_params, hp)

    if "synthetic" in args.dataList:
        # held-out seed: the synthetic train/val sets use seeds 0 /
        # 10_000 (cli.train_feature.make_source) — evaluating on the
        # training scenes would overstate a trained checkpoint
        source = dsets.SyntheticPairs(args.family,
                                      n=min(args.maxIter, 1000),
                                      seed=args.eval_seed,
                                      ramp_weight=args.ramp_weight,
                                      n_clutter=args.n_clutter)
    else:
        source = dsets.PanoPairDataset(
            args.family, "test", args.listPath,
            entry_split=args.entrySplit)

    # all repeats accumulate into one result file; resume skips completed
    # (repeat, pair) iterations (evaluation.py:129-133, 156-158)
    runner = harness.evaluate_stream(
        lambda: dsets.batched(source, args.batch_pairs,
                              max_items=cfg.max_iter), eval_fn, cfg)
    runner.print_stats()
    print(json.dumps(runner.summary()))
    return runner


if __name__ == "__main__":
    main()
