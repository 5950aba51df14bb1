"""Classical registration baselines (super4pcs / gs / fgs / cgs).

Dispatches to the native C++ module (`cpp/`, loaded via ctypes) that
re-implements the capabilities the reference gets from the external
Super4PCS binary and Open3D (baselines.py:10-168): voxel downsampling,
normal estimation, FPFH features, RANSAC global registration, fast global
registration, and colored ICP.
"""

from __future__ import annotations

import numpy as np

from relativepose_tpu.eval import harness


def _native():
    from relativepose_tpu.native import registration
    return registration


def super4pcs(pc_src, pc_tgt, overlap: float = 0.5, delta: float = 0.1,
              time_budget_s: float = None, n_points: int = 200):
    """4PCS-style congruent-set registration (baselines.py:10-35 CLI args:
    -o 0.5 -d 0.1 -t 1000 -n 200).  Identity fallback on failure.

    Default budget 240 s (the reference's subprocess timeout,
    baselines.py:24); the native search also early-exits on LCP target or
    stagnation.  RPTPU_S4PCS_BUDGET overrides for large campaigns."""
    if time_budget_s is None:
        import os
        time_budget_s = float(os.environ.get("RPTPU_S4PCS_BUDGET", 240.0))
    try:
        return _native().super4pcs(pc_src, pc_tgt, overlap, delta,
                                   time_budget_s, n_points)
    except Exception:
        return np.eye(4)


def global_registration(pc_src, pc_tgt, voxel: float = 0.05):
    """FPFH + RANSAC (baselines.py:52-81)."""
    return _native().global_registration(pc_src, pc_tgt, voxel)


def fast_global_registration(pc_src, pc_tgt, voxel: float = 0.05):
    """FGR-style Geman-McClure optimization (baselines.py:83-103)."""
    return _native().fast_global_registration(pc_src, pc_tgt, voxel)


def colored_registration(pc_src, pc_tgt, color_src, color_tgt,
                         voxel: float = 0.05):
    """RANSAC init + multi-scale colored ICP (baselines.py:110-168)."""
    return _native().colored_registration(pc_src, pc_tgt, color_src,
                                          color_tgt, voxel)


METHODS = {
    "super4pcs": lambda s, t, cs, ct: super4pcs(s, t),
    "gs": lambda s, t, cs, ct: global_registration(s, t),
    "fgs": lambda s, t, cs, ct: fast_global_registration(s, t),
    "cgs": colored_registration,
}


def run_classical_eval(args, cfg: harness.EvalConfig):
    """Per-pair host loop for the classical methods (they are CPU-native);
    mirrors evaluation.py:190-201 incl. the overlap < 0.1 skip.

    Overlap statistics come from the native GridNN (`rp_overlap_stats`)
    instead of the device chunked-matmul path: on one host core the
    O(N^2) matmul costs ~10 s per 26k-point pano pair and is intractable
    for the ~300k-point scannet full frames, while the grid hash is
    ~10 ms.  Since the same pairs are evaluated by all four methods, the
    stats are also cached on disk (tmp/overlap_cache) keyed by the scene
    identity, so 3 of the 4 method runs skip the computation entirely."""
    import os

    import jax.numpy as jnp

    from relativepose_tpu.data import datasets as dsets
    from relativepose_tpu.native import registration as natreg

    ov_cache_dir = None
    if "synthetic" in args.dataList:
        seed0 = getattr(args, "eval_seed", 20_000)
        source = dsets.SyntheticPairs(
            args.family, n=min(args.maxIter, 1000), seed=seed0,
            ramp_weight=getattr(args, "ramp_weight", 0.35),
            n_clutter=getattr(args, "n_clutter", 0))
        ov_cache_dir = os.path.join("tmp", "overlap_cache")
        os.makedirs(ov_cache_dir, exist_ok=True)

        def ov_key(i):
            tag = f"_rw{source.ramp_weight:g}" if source.ramp_weight != 0.35 \
                else ""
            tag += f"_cl{source.n_clutter}" if source.n_clutter else ""
            # all four classical methods share the parse, so the key is
            # scene identity only
            return os.path.join(ov_cache_dir,
                                f"{args.family}_{seed0 + i}{tag}.npz")
    else:
        source = dsets.PanoPairDataset(args.family, "test", args.listPath,
                                       entry_split=args.entrySplit)
    method = METHODS[args.method]
    runner = harness.EvalRunner(cfg)
    # index-based resume: classical methods skip low-overlap pairs without
    # recording, so resume from the highest recorded pair index instead of
    # by count
    start = 0
    if runner.error_stats:
        start = 1 + max(int(r.get("pair_idx", -1))
                        for r in runner.error_stats)
    for i in range(start, min(len(source), args.maxIter)):
        item = source[i]
        d_s, d_t = item["data_s"], item["data_t"]
        T_gt = jnp.asarray(item["T_gt"])
        def _full(view, key):
            # scannet classical baselines consume the original 480x640
            # frame (evaluation.py:165-166); other datasets have none
            return jnp.asarray(view[key]) if key in view else None

        pc_s, val_s, col_s = harness.parse_eval_data(
            jnp.asarray(d_s["depth"]), jnp.asarray(d_s["rgb"]),
            jnp.asarray(d_s["norm"]), args.family, args.method,
            depth_full=_full(d_s, "depth_full"),
            rgb_full=_full(d_s, "rgb_full"))
        pc_t, val_t, col_t = harness.parse_eval_data(
            jnp.asarray(d_t["depth"]), jnp.asarray(d_t["rgb"]),
            jnp.asarray(d_t["norm"]), args.family, args.method,
            depth_full=_full(d_t, "depth_full"),
            rgb_full=_full(d_t, "rgb_full"))
        ps = np.asarray(pc_s)[np.asarray(val_s)]
        pt = np.asarray(pc_t)[np.asarray(val_t)]
        ov = None
        ov_path = ov_key(i) if ov_cache_dir else None
        if ov_path and os.path.exists(ov_path):
            with np.load(ov_path) as z:
                ov = {k: float(z[k]) for k in
                      ("overlap", "cam_dist", "pc_dist", "pc_nn")}
        if ov is None:
            ov = natreg.overlap_stats(ps, pt, np.asarray(T_gt))
            if ov_path:
                tmp_p = ov_path + f".tmp{os.getpid()}"
                np.savez(tmp_p, **ov)
                os.replace(tmp_p + ".npz", ov_path)
        if float(ov["overlap"]) < 0.1:  # evaluation.py:190-191
            continue
        cs = np.asarray(col_s)[np.asarray(val_s)]
        ct = np.asarray(col_t)[np.asarray(val_t)]
        T_hat = np.asarray(method(ps, pt, cs, ct), np.float32)
        errs = harness.pose_errors(jnp.asarray(T_hat), T_gt, pc_s, val_s)
        runner.record({
            "overlap": float(ov["overlap"]), "pair_idx": i,
            "cam_dist": float(ov["cam_dist"]),
            "pc_dist": float(ov["pc_dist"]), "pc_nn": float(ov["pc_nn"]),
            **{k: float(v) for k, v in errs.items()}, "T_hat": T_hat})
    runner.save()
    runner.print_stats()
    return runner
