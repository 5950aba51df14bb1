"""Measure the reference pipeline's per-stage cost on THIS machine.

Replaces the bench.py guess (REFERENCE_PAIRS_PER_SEC = 0.5) with numbers
measured by running the reference's OWN code on realistic workloads:

  * solver  — RPModule.rpmodule.RelativePoseEstimation_helper (numpy +
    scipy ARPACK, method 'irls+sm'), fed matching primitives extracted by
    this repo's pipeline from synthetic scenes (same keypoint budget the
    TPU path uses), on the reference's own tuned sigma table.
  * warp    — util.warping (numpy splat of the observed face through a
    pose; runs on HOST even in the reference's GPU deployment,
    evaluation.py:235-236).
  * SIFT    — cv2 SIFT detect+describe on the observed face, the keypoint
    stage of RPModule/rputil.py:152-175 (xfeatures2d.SIFT_create is the
    same algorithm as the mainline cv2.SIFT_create used here).
  * scnet   — the reference SCNet (model/mymodel.py:141-380) forward,
    batch 2, torch on host CPU.

The reference repo is loaded read-only with two shims: empty module stubs
for open3d/torchvision (unused on these paths), and the documented
one-token syntax repair of rpmodule.py:342-343 (`FEAT_SCALING.` ->
`FEAT_SCALING`; see SURVEY.md "checked-in bugs", the shipped .pyc
predates the typo).  No reference code is copied into the package — this
tool only *times* it.

Per-pair composition mirrors evaluation.py:232-284 (method 'ours',
alterStep=3: each step warps both views, completes both in one batch-2
SCNet call, detects keypoints on both, and solves once):

  t_pair(host)     = 3 * (2*warp + scnet_b2 + 2*sift + solver)
  t_pair(free-GPU) = 3 * (2*warp +    0     + 2*sift + solver)

"free-GPU" charges ZERO for the network — a strict lower bound on any
GPU deployment of the reference, since warp/SIFT/solver stay on host
(evaluation.py's own structure).  bench.py uses the free-GPU figure as
REFERENCE_PAIRS_PER_SEC, i.e. the conservative choice.

Writes BASELINE_MEASURED.json at the repo root.

Usage:
    python tools/measure_reference_baseline.py [--pairs 12] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)


def load_reference_modules():
    """Import the reference's util / rputil / rpmodule / mymodel with the
    documented shims.  Returns (util, rputil, rpmodule, mymodel)."""
    sys.path.insert(0, REF)
    for name in ("open3d", "torchvision"):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.__path__ = []  # mark as package so submodules import
            sys.modules[name] = stub
    for sub in ("torchvision.utils", "torchvision.models"):
        mod = types.ModuleType(sub)
        sys.modules[sub] = mod
        setattr(sys.modules["torchvision"], sub.split(".")[1], mod)

    import util  # noqa: E402  (reference geometry core)
    import RPModule  # noqa: E402
    import RPModule.rputil as rputil  # noqa: E402

    src = open(os.path.join(REF, "RPModule", "rpmodule.py")).read()
    # the one-token syntax repair (rpmodule.py:342-343)
    src = src.replace("FEAT_SCALING.\n", "FEAT_SCALING\n")
    rpmodule = types.ModuleType("RPModule.rpmodule")
    rpmodule.__package__ = "RPModule"
    rpmodule.__file__ = os.path.join(REF, "RPModule", "rpmodule.py")
    sys.modules["RPModule.rpmodule"] = rpmodule
    exec(compile(src, rpmodule.__file__, "exec"), rpmodule.__dict__)

    import model.mymodel as mymodel  # noqa: E402
    return util, rputil, rpmodule, mymodel


def extract_primitive_sets(n_pairs: int):
    """Solver-ready primitives from synthetic scenes via the repo's own
    keypoint pipeline (oracle GT completion, eval-default keypoint budget).
    Returns a list of (dataS, dataT) numpy dicts with valid rows only."""
    import jax
    import jax.numpy as jnp

    from relativepose_tpu.config import ChannelLayout
    from relativepose_tpu.core import masking
    from relativepose_tpu.data import datasets as dsets
    from relativepose_tpu.match import primitives as prim
    from relativepose_tpu.match.keypoints import KeypointConfig
    from relativepose_tpu.pipeline.oracle import procedural_descriptors

    layout = ChannelLayout("rgbdnsf", 15, 32)
    kp_cfg = KeypointConfig()
    src = dsets.SyntheticPairs(
        "suncg", n=n_pairs, seed=50_000, max_baseline=0.8,
        cache_dir=os.environ.get("RPTPU_SYNTH_CACHE"))

    @jax.jit
    def extract(rgb_s, rgb_t, d_s, d_t, n_s, n_t, key):
        f_s = procedural_descriptors(rgb_s, layout.feature_dim)
        f_t = procedural_descriptors(rgb_t, layout.feature_dim)
        # same keypoint input prep as the pipeline (recurrent.py:130-141):
        # masked 0..255 rgb so DoG fires only on the observed face
        _, m_s, _ = masking.apply_mask(
            jnp.concatenate([rgb_s, n_s, d_s[..., None]], -1), "second")
        _, m_t, _ = masking.apply_mask(
            jnp.concatenate([rgb_t, n_t, d_t[..., None]], -1), "second")
        return prim.extract_primitives(
            m_s * rgb_s * 255.0, m_t * rgb_t * 255.0, d_s, d_t, n_s, n_t,
            f_s, f_t, key, kp_cfg, "suncg", "second")

    sets = []
    for i in range(n_pairs):
        item = src[i]
        ds, dt = item["data_s"], item["data_t"]
        ps, pt = extract(
            jnp.asarray(ds["rgb"]), jnp.asarray(dt["rgb"]),
            jnp.asarray(ds["depth"]), jnp.asarray(dt["depth"]),
            jnp.asarray(ds["norm"]), jnp.asarray(dt["norm"]),
            jax.random.PRNGKey(i))
        ps = {k: np.asarray(v) for k, v in ps.items()}
        pt = {k: np.asarray(v) for k, v in pt.items()}
        trim = lambda p: {k: p[k][p["valid"]] for k in
                          ("pc", "normal", "feat", "weight")}
        sets.append((trim(ps), trim(pt)))
    return sets


def time_solver(rpmodule, rputil, sets, reps: int):
    """Reference irls+sm solver on the reference's tuned suncg sigmas."""
    tbl = np.loadtxt(os.path.join(
        REF, "data", "relativePoseModule", "final_param_suncg_rlevel_3.txt"))
    row = tbl[0] if tbl.ndim == 2 else tbl
    para = rputil.opts(sigmaAngle1=row[0], sigmaAngle2=row[1],
                       sigmaDist=row[2], sigmaFeat=row[3])
    # warm once (BLAS/ARPACK init)
    rpmodule.RelativePoseEstimation_helper(sets[0][0], sets[0][1], para)
    times = []
    for _ in range(reps):
        for ds, dt in sets:
            t0 = time.perf_counter()
            rpmodule.RelativePoseEstimation_helper(ds, dt, para)
            times.append(time.perf_counter() - t0)
    return float(np.mean(times)), float(np.median(times))


def time_warp(util, reps: int):
    rng = np.random.RandomState(0)
    view = rng.rand(1, 8, 160, 640).astype(np.float32)
    view[0, 6] = rng.rand(160, 640) * 3 + 0.5
    from scipy.spatial.transform import Rotation as _R
    R = np.eye(4)
    R[:3, :3] = _R.from_euler("y", 35, degrees=True).as_matrix()
    util.warping(view, R, "suncg")  # warm
    t0 = time.perf_counter()
    for _ in range(reps * 4):
        util.warping(view, R, "suncg")
    return (time.perf_counter() - t0) / (reps * 4)


def time_sift(reps: int):
    import cv2

    from relativepose_tpu.data import datasets as dsets
    item = dsets.SyntheticPairs(
        "suncg", n=1, seed=50_000,
        cache_dir=os.environ.get("RPTPU_SYNTH_CACHE"))[0]
    face = (item["data_s"]["rgb"][:, 160:320] * 255).astype(np.uint8)
    gray = cv2.cvtColor(face, cv2.COLOR_BGR2GRAY)
    sift = cv2.SIFT_create(contrastThreshold=0.02)  # rputil.py:152
    sift.detectAndCompute(gray, None)  # warm
    t0 = time.perf_counter()
    for _ in range(reps * 4):
        kp, _ = sift.detectAndCompute(gray, None)
    return (time.perf_counter() - t0) / (reps * 4), len(kp)


def time_scnet(mymodel, reps: int):
    import torch
    torch.set_num_threads(os.cpu_count() or 1)

    class A:  # minimal opts stand-in for SCNet.__init__
        batchnorm = 1
        useTanh = 1
        skipLayer = 1
        outputType = "rgbdnsf"
        snumclass = 15
        featureDim = 32
        ngf = 64

    net = mymodel.SCNet(A()).eval()
    x = torch.randn(2, 16, 160, 640)
    with torch.no_grad():
        net(x)  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            net(x)
        return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=12)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "BASELINE_MEASURED.json"))
    args = ap.parse_args()

    print("extracting primitives via the repo pipeline...", flush=True)
    sets = extract_primitive_sets(args.pairs)
    counts = [s[0]["pc"].shape[0] for s in sets]
    print(f"  {len(sets)} primitive sets, keypoints/view "
          f"median {int(np.median(counts))}", flush=True)

    print("loading reference modules...", flush=True)
    util, rputil, rpmodule, mymodel = load_reference_modules()

    solver_mean, solver_median = time_solver(rpmodule, rputil, sets,
                                             args.reps)
    print(f"  solver (irls+sm, ARPACK): {solver_mean*1e3:.1f} ms", flush=True)
    warp = time_warp(util, args.reps)
    print(f"  warp (numpy splat): {warp*1e3:.1f} ms", flush=True)
    sift, n_kp = time_sift(args.reps)
    print(f"  SIFT ({n_kp} kp/face): {sift*1e3:.1f} ms", flush=True)
    scnet = time_scnet(mymodel, args.reps)
    print(f"  SCNet fwd batch-2 torch-CPU: {scnet*1e3:.1f} ms", flush=True)

    alter = 3
    host = alter * (2 * warp + scnet + 2 * sift + solver_mean)
    free_gpu = alter * (2 * warp + 2 * sift + solver_mean)
    result = {
        "host": os.uname().nodename,
        "cpu_count": os.cpu_count(),
        "pairs": args.pairs,
        "keypoints_per_view_median": int(np.median(counts)),
        "stage_ms": {
            "solver_irls_sm_mean": round(solver_mean * 1e3, 2),
            "solver_irls_sm_median": round(solver_median * 1e3, 2),
            "warp_suncg": round(warp * 1e3, 2),
            "sift_face": round(sift * 1e3, 2),
            "scnet_fwd_b2_cpu": round(scnet * 1e3, 2),
        },
        "alter_steps": alter,
        "sec_per_pair_host": round(host, 4),
        "sec_per_pair_free_gpu": round(free_gpu, 4),
        "reference_pairs_per_sec_host": round(1.0 / host, 4),
        "reference_pairs_per_sec_free_gpu": round(1.0 / free_gpu, 4),
        "note": "free_gpu charges 0 for SCNet (strict reference upper "
                "bound on throughput); warp/SIFT/solver run on host in "
                "the reference regardless (evaluation.py:232-284).",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
