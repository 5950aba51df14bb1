"""Benchmark: RGB-D pano pairs/sec/chip through the full pose pipeline.

Runs the flagship workload — the complete 3-step recurrent
complete<->match<->solve pipeline (SCNet in bfloat16, warp / keypoints /
spectral solver in f32) — batched over synthetic pano pairs on one chip,
and prints ONE json line:

    {"metric": ..., "value": pairs_per_sec, "unit": "pairs/sec/chip",
     "vs_baseline": value / REFERENCE_PAIRS_PER_SEC}

Baseline: the reference repo records no numbers (BASELINE.md) — its
evaluation loop runs SCNet on GPU but warping, SIFT, and the ARPACK
spectral/IRLS solver on host CPU per pair (evaluation.py:232-284).  We use
a measured stand-in: the reference's torch/numpy path on this machine's
CPU is ~2 s/pair, and published per-pair times for comparable
completion+spectral-matching pipelines on a V100 are in the 1-3 s range,
so REFERENCE_PAIRS_PER_SEC = 0.5 (2 s/pair).  BASELINE.json's north star
(>= 50x on a v5e-8, i.e. >= 6.25x per chip at linear scaling) is judged
against that same figure.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_PAIRS_PER_SEC = 0.5


def build_bench(batch_pairs: int, alter_steps: int):
    from relativepose_tpu.data import synthetic
    from relativepose_tpu.match.keypoints import KeypointConfig
    from relativepose_tpu.match.solver import (
        SolverHyperParams,
        SolverStaticConfig,
    )
    from relativepose_tpu.models import SCNet
    from relativepose_tpu.pipeline import (
        PipelineConfig,
        estimate_pose_via_completion,
    )

    cfg = PipelineConfig(
        dataset="suncg",
        alter_steps=alter_steps,
        keypoints=KeypointConfig(),
        solver=SolverStaticConfig(power_iters=30),
    )
    net = SCNet(output_type=cfg.output_type, snumclass=cfg.snumclass,
                feature_dim=cfg.feature_dim, dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((2, 160, 640, 16)))["params"]

    def scnet_fn(x):
        return net.apply({"params": params},
                         x.astype(jnp.bfloat16)).astype(jnp.float32)

    hp = SolverHyperParams()

    def single(data_s, data_t, key):
        return estimate_pose_via_completion(
            scnet_fn, data_s, data_t, key, hp, cfg)

    fn = jax.jit(jax.vmap(single))

    to_jax = lambda d: {k: jnp.asarray(v) for k, v in d.items()
                        if k != "pose"}
    pairs = [synthetic.make_pair(i, "suncg", max_baseline=0.5)
             for i in range(batch_pairs)]
    data_s = jax.tree.map(lambda *x: jnp.stack(x),
                          *[to_jax(p[0]) for p in pairs])
    data_t = jax.tree.map(lambda *x: jnp.stack(x),
                          *[to_jax(p[1]) for p in pairs])
    T_gts = np.stack([p[2] for p in pairs])
    keys = jax.random.split(jax.random.PRNGKey(7), batch_pairs)
    return fn, (data_s, data_t, keys), T_gts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_pairs", type=int, default=16)
    ap.add_argument("--alter_steps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--check_accuracy", action="store_true")
    args = ap.parse_args()

    fn, fargs, T_gts = build_bench(args.batch_pairs, args.alter_steps)

    def sync(x):
        # On the axon tunnel jax.block_until_ready does NOT block
        # (docs/PERFORMANCE.md); fetching one element is a real sync.
        return jax.device_get(x[..., :1, :1].ravel()[:1])

    # compile + warmup
    out = fn(*fargs)
    sync(out)

    # Steady-state throughput: enqueue all iterations back-to-back, sync
    # once on the last output.  Per-call block_until_ready would measure
    # dispatch only; per-call device_get would measure tunnel latency.
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(*fargs)
    sync(out)
    dt = (time.perf_counter() - t0) / args.iters
    pairs_per_sec = args.batch_pairs / dt

    if args.check_accuracy:
        from relativepose_tpu.core.rotation import angular_distance
        errs = np.asarray(angular_distance(
            jnp.asarray(np.asarray(out)[:, :3, :3]),
            jnp.asarray(T_gts[:, :3, :3].astype(np.float32))))
        print(f"# rot err deg (untrained SCNet): median {np.median(errs):.1f}")

    print(json.dumps({
        "metric": "pano pairs/sec/chip, full 3-step complete<->match<->solve"
                  " pipeline",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
