"""Fine-tune a trained SCNet with the end-to-end pose loss.

The unique capability of the TPU rebuild (train/finetune_pose.py): the
whole complete->match->solve recurrence is differentiable, so SCNet can be
trained against the actual pose error instead of per-pixel proxies.

Usage (after cli.train_completion):
    python -m relativepose_tpu.cli.finetune_pose \
        --exp comp_suncg_ft --comp_ckpt experiments/exp_comp_suncg/params \
        --synthetic_family suncg --steps 400 --batch_pairs 4

Writes a normal completion-style checkpoint (restorable by
cli.evaluate --comp_ckpt) to experiments/exp_<exp>/params.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from relativepose_tpu.data import datasets as dsets
from relativepose_tpu.eval import harness
from relativepose_tpu.match.keypoints import KeypointConfig
from relativepose_tpu.pipeline import PipelineConfig
from relativepose_tpu.train import finetune_pose
from relativepose_tpu.utils.checkpoint import CheckpointManager
from relativepose_tpu.utils.experiment import ExperimentDirs
from relativepose_tpu.utils.log import FileLogger


def main(argv=None):
    import relativepose_tpu
    relativepose_tpu.enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp", type=str, required=True)
    p.add_argument("--comp_ckpt", type=str, required=True)
    p.add_argument("--synthetic_family", type=str, default="suncg")
    p.add_argument("--synthetic_n", type=int, default=1024)
    p.add_argument("--view_detail_jitter", type=int, default=1)
    p.add_argument("--ramp_weight", type=float, default=0.35,
                   help="v4 scene knob (see cli.common)")
    p.add_argument("--n_clutter", type=int, default=0)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch_pairs", type=int, default=4)
    p.add_argument("--alter_steps", type=int, default=2,
                   help="recurrence depth while fine-tuning (the eval "
                        "runs 3; 2 halves the backward cost and the "
                        "per-step sigma table still applies)")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--refit", type=int, default=0,
                   help="solver inlier-refit rounds; train through the "
                        "same graph that will be evaluated (see "
                        "cli.evaluate --refit)")
    p.add_argument("--rot_weight", type=float, default=1.0)
    p.add_argument("--trans_weight", type=float, default=0.25)
    p.add_argument("--anchor_weight", type=float, default=0.0)
    p.add_argument("--max_overlap", type=float, default=0.55,
                   help="train only on pairs at or below this point-cloud "
                        "overlap (the capability target is the low-overlap "
                        "buckets; high-overlap pairs are already solved by "
                        "observed-region matching)")
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--bf16", type=int, default=1)
    p.add_argument("--save_every", type=int, default=100)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--rm", action="store_true")
    args = p.parse_args(argv)

    dirs = ExperimentDirs(args.exp, rm=args.rm, resume=not args.rm)
    logf = FileLogger(dirs.log_path)
    family = args.synthetic_family

    from relativepose_tpu import config as rp_config
    from relativepose_tpu.match.solver import SolverStaticConfig
    pipe_cfg = PipelineConfig(
        dataset=family, alter_steps=args.alter_steps, completion=True,
        mask_method="kinect" if family == "scannet" else "second",
        snumclass=rp_config.NUM_CLASSES[family],
        keypoints=KeypointConfig(), remat=True,
        # Pallas kernels have no autodiff rule — the differentiable path
        # must use the XLA W build / power iteration
        solver=SolverStaticConfig(pallas_w_build=False, use_pallas=False,
                                  refit_rounds=args.refit))
    hp = harness.hyper_params_from_table(
        harness.default_sigma_table(family)[:args.alter_steps],
        alter_steps=args.alter_steps)
    ft_cfg = finetune_pose.PoseFinetuneConfig(
        learning_rate=args.lr, rot_weight=args.rot_weight,
        trans_weight=args.trans_weight, anchor_weight=args.anchor_weight,
        ngf=args.ngf, dtype=jnp.bfloat16 if args.bf16 else None)

    from relativepose_tpu.utils.checkpoint import restore_params
    params = jax.device_put(restore_params(args.comp_ckpt)["params"])
    tx = finetune_pose.make_optimizer(ft_cfg)
    state = {"params": params, "anchor_params": params,
             "opt_state": tx.init(params), "step": 0}

    # device-resident low-overlap training pairs
    from relativepose_tpu.core import overlap as overlap_mod
    from relativepose_tpu.data.device_store import DeviceStore
    src = dsets.SyntheticPairs(
        family, n=args.synthetic_n, seed=0,
        view_detail_jitter=bool(args.view_detail_jitter),
        ramp_weight=args.ramp_weight, n_clutter=args.n_clutter)
    store = DeviceStore(src, log=logf)

    @jax.jit
    def pair_overlap(arrays, idx):
        ds, dt, T_gt = finetune_pose.gather_eval_pairs(arrays, idx)

        def one(d_s, d_t, T):
            pc_s, val_s, _ = harness.parse_eval_data(
                d_s["depth"], d_s["rgb"], d_s["norm"], family, "ours")
            pc_t, val_t, _ = harness.parse_eval_data(
                d_t["depth"], d_t["rgb"], d_t["norm"], family, "ours")
            return overlap_mod.point_cloud_overlap(
                pc_s, val_s, pc_t, val_t, T)["overlap"]

        return jax.vmap(one)(ds, dt, T_gt)

    ovs = []
    for lo in range(0, store.n, 64):
        idx = jnp.arange(lo, min(lo + 64, store.n), dtype=jnp.int32)
        ovs.append(np.asarray(jax.device_get(
            pair_overlap(store.arrays, idx))))
    ovs = np.concatenate(ovs)
    keep = np.where(ovs <= args.max_overlap)[0].astype(np.int32)
    logf(f"{len(keep)}/{store.n} pairs at overlap <= {args.max_overlap} "
         f"(median kept overlap {np.median(ovs[keep]):.3f})")

    step_jit = jax.jit(finetune_pose.make_finetune_step(pipe_cfg, hp,
                                                        ft_cfg))
    gather = jax.jit(finetune_pose.gather_eval_pairs)
    ckpt = CheckpointManager(dirs.params_dir, keep=3)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    for it in range(args.steps):
        idx = jnp.asarray(rng.choice(keep, size=args.batch_pairs,
                                     replace=False))
        data_s, data_t, T_gt = gather(store.arrays, idx)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, args.batch_pairs)
        state, metrics = step_jit(state, data_s, data_t, T_gt, keys)
        if (it + 1) % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            logf(f"step {it + 1}/{args.steps} loss {m['loss']:.4f} "
                 f"rotF2 {m['rot_frob2']:.4f} trans {m['trans_se']:.4f} "
                 f"gnorm {m['grad_norm']:.3f} "
                 f"({(time.time() - t0) / (it + 1):.2f} s/step)")
        if (it + 1) % args.save_every == 0 or it + 1 == args.steps:
            ckpt.save(it + 1, jax.device_get(
                {"params": state["params"], "step": state["step"]}))
            logf(f"step {it + 1}: checkpoint saved")


if __name__ == "__main__":
    main()
