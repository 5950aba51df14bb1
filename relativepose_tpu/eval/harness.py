"""Evaluation harness: per-overlap-bucket pose-error statistics.

Re-implements evaluation.py:110-333 with the same protocol:
  * methods: ours / ours_nr (alterStep=1) / ours_nc (completion off) plus
    the classical baselines (super4pcs / gs / fgs / cgs, dispatched to the
    native C++ module);
  * GT relative pose R_gt = R_tgt @ inv(R_src) (evaluation.py:173-176);
  * overlap buckets {0-0.1, 0.1-0.5, 0.5-1.0}; classical methods skip
    pairs with overlap < 0.1 (evaluation.py:190-191);
  * rotation error = geodesic degrees; translation error =
    ||(R_hat - R_gt) @ mean(pc_src) + t_hat - t_gt|| (evaluation.py:294-297)
    plus the 'blind' identity-pose baselines;
  * results appended to `<exp>.result.npy` every `save_every` pairs with
    resume-by-count (evaluation.py:129-133, :319-320).

Unlike the reference (one pair at a time, host round trips), the `ours*`
path batches `batch_pairs` pano pairs through the jitted recurrent pipeline
per device step.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from relativepose_tpu.core import overlap as overlap_mod
from relativepose_tpu.core import skybox
from relativepose_tpu.core.rotation import angular_distance
from relativepose_tpu.match.solver import SolverHyperParams
from relativepose_tpu.pipeline import PipelineConfig, estimate_pose_via_completion

OVERLAP_BUCKETS = ("0-0.1", "0.1-0.5", "0.5-1.0")
CLASSICAL_METHODS = ("super4pcs", "fgs", "gs", "cgs")


def bucket_of(overlap_val: float) -> str:
    return ("0-0.1" if overlap_val <= 0.1
            else "0.1-0.5" if overlap_val <= 0.5 else "0.5-1.0")


@dataclasses.dataclass
class EvalConfig:
    dataset: str = "suncg"
    method: str = "ours"
    exp: str = "eval"
    out_dir: str = "tmp/rpe"
    max_iter: int = 1000
    num_repeat: int = 1
    save_every: int = 100
    batch_pairs: int = 4
    resume: bool = True
    sigma_table: Optional[np.ndarray] = None  # [steps, 4] like --para files
    per_step_errors: bool = False  # record rot/trans error after each step
    # explicit recurrence depth (the reference's --alterStep flag,
    # evaluation.py:56,73: default rlevel=3, ours_nr forces 1).  None =
    # the reference's method-derived default.
    alter_steps_override: Optional[int] = None

    @property
    def alter_steps(self) -> int:
        if self.alter_steps_override is not None:
            return self.alter_steps_override
        return 1 if self.method == "ours_nr" else 3  # evaluation.py:73

    @property
    def completion(self) -> bool:
        return self.method != "ours_nc"  # evaluation.py:74


def default_sigma_table(dataset: str) -> np.ndarray:
    """Tuned rlevel-3 sigma tables shipped by the reference
    (data/relativePoseModule/final_param_*_rlevel_3.txt)."""
    import relativepose_tpu
    root = os.path.join(os.path.dirname(relativepose_tpu.__file__), "data",
                        "params")
    from relativepose_tpu.config import canonical_dataset
    path = os.path.join(root, f"final_param_{canonical_dataset(dataset)}"
                        "_rlevel_3.txt")
    if os.path.exists(path):
        return np.loadtxt(path).reshape(-1, 4)
    return np.tile([0.2615, 0.2615, 0.04, 0.01], (3, 1))


def hyper_params_from_table(table: Optional[np.ndarray],
                            alter_steps: Optional[int] = None
                            ) -> SolverHyperParams:
    """Build per-step solver sigmas from a [steps, 4] --para table.

    `alter_steps` (when given) is validated against the table length: the
    pipeline indexes the table with a traced step index, which would
    silently clamp to the last row for a too-short table (the reference's
    numpy path raises IndexError instead, evaluation.py:96-100)."""
    if table is None:
        return SolverHyperParams(sigma_angle1=0.2615, sigma_angle2=0.2615,
                                 sigma_dist=0.04, sigma_feat=0.01)
    table = np.asarray(table)
    if alter_steps is not None and table.shape[0] < alter_steps:
        raise ValueError(
            f"sigma table has {table.shape[0]} rows but the pipeline runs "
            f"{alter_steps} recurrence steps — the --para file must have at "
            "least one row per step (evaluation.py:96-100)")
    t = jnp.asarray(table, jnp.float32)
    return SolverHyperParams(sigma_angle1=t[:, 0], sigma_angle2=t[:, 1],
                             sigma_dist=t[:, 2], sigma_feat=t[:, 3])


def parse_eval_data(depth, rgb, norm, dataset: str, method: str,
                    depth_full=None, rgb_full=None):
    """Observed-region point clouds + colors for overlap / baselines.

    Mirrors util.parse_data (util.py:42-92): suncg/matterport use the
    second 160x160 face; scannet 'ours' uses the 66x88 kinect crop;
    scannet with a classical method uses the ORIGINAL 480x640 kinect
    frame (`depth_full`/`rgb_full`, evaluation.py:165-166, util.py:80-92)
    — pass those tensors for that branch.  Fixed-shape: returns
    (pc [N, 3], valid [N], color [N, 3]).
    """
    from relativepose_tpu import config
    ds = config.canonical_dataset(dataset)
    F = config.FACE
    if ds in ("suncg", "matterport"):
        d = depth[:, F:2 * F]
        c = rgb[:, F:2 * F].reshape(-1, 3)
        pc, valid = skybox.face_depth_to_pointcloud(d, ds)
    elif "ours" in method or depth_full is None:
        r0, r1 = config.KINECT_ROW0, config.KINECT_ROW1
        c0, c1 = config.KINECT_COL0, config.KINECT_COL1
        d = depth[r0:r1, c0:c1]
        c = rgb[r0:r1, c0:c1].reshape(-1, 3)
        pc, valid = skybox.kinect_crop_to_pointcloud(d)
    else:
        # scannet + classical baseline: full-resolution source scan
        pc, valid = skybox.kinect_full_to_pointcloud(depth_full)
        c = (rgb_full.reshape(-1, 3) if rgb_full is not None
             else jnp.zeros((pc.shape[0], 3), pc.dtype))
    return pc, valid, c


def pose_errors(T_hat, T_gt, pc_src, src_valid):
    """Rotation geodesic + translation error (evaluation.py:291-297).

    err_t_blind reproduces the reference's quirk ||t_hat - t_gt||
    (evaluation.py:297) — it depends on the evaluated method's own
    prediction, so it is NOT an identity-pose baseline.  err_t_id is the
    true identity-pose (R=I, t=0) translation error under the same err_t
    formula: ||(I - R_gt) @ mean_pc - t_gt|| (ADVICE r4)."""
    R_hat, t_hat = T_hat[:3, :3], T_hat[:3, 3]
    R_gt, t_gt = T_gt[:3, :3], T_gt[:3, 3]
    err_ad = angular_distance(R_hat, R_gt)
    err_blind = angular_distance(R_gt, jnp.eye(3))
    w = src_valid.astype(pc_src.dtype)
    mean_pc = jnp.sum(pc_src * w[:, None], 0) / jnp.maximum(jnp.sum(w), 1.0)
    err_t = jnp.linalg.norm((R_hat - R_gt) @ mean_pc + t_hat - t_gt)
    err_t_blind = jnp.linalg.norm(t_hat - t_gt)
    err_t_id = jnp.linalg.norm((jnp.eye(3) - R_gt) @ mean_pc - t_gt)
    return {"err_ad": err_ad, "err_blind": err_blind, "err_t": err_t,
            "err_t_blind": err_t_blind, "err_t_id": err_t_id}


def make_batched_eval_fn(scnet_fn_factory: Callable, cfg: EvalConfig,
                         pipe_cfg: PipelineConfig):
    """Jitted per-pair eval: pipeline pose + overlap + errors, vmapped.

    scnet_fn_factory(data_s, data_t, params) -> completion fn; `params`
    (the SCNet weights, or {} for the oracle) are an argument of the
    returned fn — NOT closure constants — so the compiled module is
    checkpoint-independent (see cli.evaluate.scnet_fn_factory_from_
    checkpoint).  The sigma table rides as an argument for the same
    reason: a --para/tuned run must not recompile the whole pipeline."""

    def one_pair(data_s, data_t, T_gt, key, params, hp):
        scnet_fn = scnet_fn_factory(data_s, data_t, params)
        step_ts = None
        if cfg.per_step_errors:
            T_hat, step_ts = estimate_pose_via_completion(
                scnet_fn, data_s, data_t, key, hp, pipe_cfg,
                return_step_poses=True)
        else:
            T_hat = estimate_pose_via_completion(
                scnet_fn, data_s, data_t, key, hp, pipe_cfg)
        pc_s, val_s, _ = parse_eval_data(
            data_s["depth"], data_s["rgb"], data_s["norm"], cfg.dataset,
            cfg.method)
        pc_t, val_t, _ = parse_eval_data(
            data_t["depth"], data_t["rgb"], data_t["norm"], cfg.dataset,
            cfg.method)
        ov = overlap_mod.point_cloud_overlap(pc_s, val_s, pc_t, val_t, T_gt)
        errs = pose_errors(T_hat, T_gt, pc_s, val_s)
        out = {"T_hat": T_hat, "overlap": ov["overlap"],
               "cam_dist": ov["cam_dist"], "pc_dist": ov["pc_dist"],
               "pc_nn": ov["pc_nn"], **errs}
        if step_ts is not None:
            se = jax.vmap(lambda Ti: pose_errors(Ti, T_gt, pc_s, val_s))(
                step_ts)
            out["rot_steps"] = se["err_ad"]      # [alter_steps]
            out["trans_steps"] = se["err_t"]
        return out

    return jax.vmap(one_pair, in_axes=(0, 0, 0, 0, None, None))


class EvalRunner:
    """Streaming evaluation with bucket statistics and resume-by-count."""

    def __init__(self, cfg: EvalConfig):
        self.cfg = cfg
        self.exp_dir = os.path.join(cfg.out_dir, cfg.exp)
        os.makedirs(self.exp_dir, exist_ok=True)
        self.result_path = os.path.join(self.exp_dir,
                                        f"{cfg.exp}.result.npy")
        self.error_stats = []
        self.ad_stats = {b: [] for b in OVERLAP_BUCKETS}
        self.t_stats = {b: [] for b in OVERLAP_BUCKETS}
        self.speed = []
        self.compile_s = None  # first-batch wall time (XLA compile)
        # blind (identity-pose) baselines, evaluation.py:294-297
        self.blind_stats = {b: [] for b in OVERLAP_BUCKETS}
        self.t_blind_stats = {b: [] for b in OVERLAP_BUCKETS}
        self.t_id_stats = {b: [] for b in OVERLAP_BUCKETS}
        # per-recurrence-step errors (cfg.per_step_errors)
        self.step_stats = {b: [] for b in OVERLAP_BUCKETS}
        self.t_step_stats = {b: [] for b in OVERLAP_BUCKETS}
        if cfg.resume and os.path.exists(self.result_path):
            self.error_stats = list(
                np.load(self.result_path, allow_pickle=True))
            # replay prior results into the bucket statistics so the
            # summary covers the whole accumulated run
            for r in self.error_stats:
                self._accumulate(r)

    @property
    def n_done(self) -> int:
        """Completed (repeat, pair) iterations — resume skips this many
        (reference resume-by-count, evaluation.py:129-133)."""
        return len(self.error_stats)

    def _accumulate(self, result: dict):
        b = bucket_of(float(result["overlap"]))
        self.ad_stats[b].append(float(result["err_ad"]))
        self.t_stats[b].append(float(result["err_t"]))
        if "err_blind" in result:
            self.blind_stats[b].append(float(result["err_blind"]))
        if "err_t_blind" in result:
            self.t_blind_stats[b].append(float(result["err_t_blind"]))
        if "err_t_id" in result:
            self.t_id_stats[b].append(float(result["err_t_id"]))
        if "rot_steps" in result:
            self.step_stats[b].append(np.asarray(result["rot_steps"]))
            self.t_step_stats[b].append(np.asarray(result["trans_steps"]))

    def record(self, result: dict):
        self._accumulate(result)
        self.error_stats.append(result)
        if len(self.error_stats) % self.cfg.save_every == 0:
            self.save()
            self.print_stats()

    def save(self):
        np.save(self.result_path, np.asarray(self.error_stats, dtype=object))

    def print_stats(self):
        for name, stats in (("rotation", self.ad_stats),
                            ("translation", self.t_stats)):
            line = ""
            for b in OVERLAP_BUCKETS:
                vals = stats[b]
                mean = np.mean(vals) if vals else float("nan")
                line += (f"{name}, overlap:{b}, nobs:{len(vals)}, "
                         f"mean:{mean:.4f}  ")
            print(line)

    def summary(self):
        out = {}
        for b in OVERLAP_BUCKETS:
            out[f"rot_{b}"] = (float(np.mean(self.ad_stats[b]))
                               if self.ad_stats[b] else None)
            out[f"trans_{b}"] = (float(np.mean(self.t_stats[b]))
                                 if self.t_stats[b] else None)
            out[f"rot_blind_{b}"] = (float(np.mean(self.blind_stats[b]))
                                     if self.blind_stats[b] else None)
            out[f"trans_blind_{b}"] = (
                float(np.mean(self.t_blind_stats[b]))
                if self.t_blind_stats[b] else None)
            out[f"trans_id_{b}"] = (float(np.mean(self.t_id_stats[b]))
                                    if self.t_id_stats[b] else None)
            if self.step_stats[b]:
                out[f"rot_steps_{b}"] = [
                    float(v) for v in np.mean(self.step_stats[b], axis=0)]
                out[f"trans_steps_{b}"] = [
                    float(v) for v in np.mean(self.t_step_stats[b], axis=0)]
        if self.speed:
            out["sec_per_pair"] = float(np.mean(self.speed))
        if self.compile_s is not None:
            out["compile_s"] = float(self.compile_s)
        return out


def evaluate_stream(pairs, eval_fn, cfg: EvalConfig, seed: int = 0):
    """Run the batched eval fn over `cfg.num_repeat` passes of pair batches.

    pairs: either a zero-arg callable returning a fresh iterable of
    (data_s, data_t, T_gt[, n_valid]) batches (required for num_repeat >
    1), or a plain iterable (single pass).  Each repeat pass evaluates at
    most `cfg.max_iter` pairs (the reference's
    `range(min(maxIter, len(dataset)))`, evaluation.py:156-158); a batch
    may carry `n_valid` < batch size (padded tail) — only real rows are
    recorded.  All repeats accumulate into ONE result file (reference
    semantics: repeats append to the same error_stats / .result.npy).  On
    resume, the first `runner.n_done` (repeat, pair) iterations are
    skipped; keys are seeded deterministically per (repeat, batch) so a
    resumed run evaluates the same stochastic keypoints it would have.

    Timing: the first executed batch includes XLA compilation — its wall
    time is reported separately as `runner.compile_s` and excluded from
    the steady-state `sec_per_pair` stats (the reference has no compile
    phase; publishing compile-polluted per-pair times understated the
    pipeline 1000x in round 2).
    """
    runner = EvalRunner(cfg)
    skip = runner.n_done
    base = jax.random.PRNGKey(seed)
    n_repeat = cfg.num_repeat if callable(pairs) else 1
    g = 0
    first_timed = True
    for rep in range(n_repeat):
        rep_key = jax.random.fold_in(base, rep)
        batches = pairs() if callable(pairs) else pairs
        done_this_rep = 0
        for bi, batch in enumerate(batches):
            if len(batch) == 4:
                data_s, data_t, T_gt, n_valid = batch
            else:
                (data_s, data_t, T_gt), n_valid = batch, batch[2].shape[0]
            n = int(min(n_valid, cfg.max_iter - done_this_rep))
            if n <= 0:
                break
            done_this_rep += n
            if g + n <= skip:  # whole batch already done
                g += n
                continue
            batch_keys = jax.random.split(
                jax.random.fold_in(rep_key, bi), T_gt.shape[0])
            t0 = time.time()
            out = jax.device_get(eval_fn(data_s, data_t, T_gt, batch_keys))
            dt = (time.time() - t0) / n
            is_compile = first_timed
            first_timed = False
            if is_compile:
                runner.compile_s = time.time() - t0
            for i in range(n):
                if g < skip:  # partially-done batch: record only the tail
                    g += 1
                    continue
                res = {k: np.asarray(v[i]) for k, v in out.items()}
                res["sec_per_pair"] = dt
                res["repeat"] = rep
                if not is_compile:
                    runner.speed.append(dt)
                runner.record(res)
                g += 1
    runner.save()
    return runner
