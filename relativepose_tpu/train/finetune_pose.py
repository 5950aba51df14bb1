"""Pose-loss fine-tuning of SCNet THROUGH the recurrent pipeline.

The reference could never do this: its pipeline bounces through host numpy
(OpenCV SIFT, scipy ARPACK, rpmodule.py:317-508) and is not differentiable.
Here `estimate_pose_via_completion` is one jittable XLA computation —
keypoint *selection* is discrete (stop-gradient by construction: top-k /
argmax indices), but every value the pose depends on (descriptor values at
the keypoints, 3-D lifts from completed depth, normals, solver weights,
Horn alignment) is smooth in the SCNet outputs.  So the final pose error
can be backpropagated into the completion net: descriptors/depth in
hallucinated regions are trained not to match a per-pixel teacher but to
make the *solver* produce the right pose — the task loss itself.

Losses:
  * rotation: squared Frobenius ||R_hat - R_gt||_F^2 (smooth everywhere,
    = 4 - 4cos(theta) for single-axis error; the geodesic's d/dtheta
    blows up at 0 and pi);
  * translation: squared error, down-weighted.

Stability: gradients through 5x(1+5) solver iterations and the 4x4 Jacobi
eigensolver are exact but can spike on near-degenerate pairs; updates are
global-norm-clipped and NaN-zeroed (optax.zero_nans).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from relativepose_tpu.models import SCNet
from relativepose_tpu.pipeline import PipelineConfig, estimate_pose_via_completion


@dataclasses.dataclass(frozen=True)
class PoseFinetuneConfig:
    learning_rate: float = 1e-5
    rot_weight: float = 1.0
    trans_weight: float = 0.25
    clip_norm: float = 1.0
    # anchor: L2 pull toward the pre-finetune parameters, so the task loss
    # refines rather than destroys the completion prior
    anchor_weight: float = 0.0
    ngf: int = 64
    dtype: Any = None


def gather_eval_pairs(arrays: dict, idx):
    """Device-side (data_s, data_t, T_gt) batch from a DeviceStore.

    Unlike data.device_store.gather_batch (training-batch assembly with
    denseCorres / reproj), this decodes the raw per-view tensors the
    pipeline consumes, plus T_gt = pose_t @ inv(pose_s)
    (evaluation.py:173-176)."""
    rgb = jnp.take(arrays["rgb"], idx, axis=0).astype(jnp.float32) / 255.0
    norm = jnp.take(arrays["norm"], idx, axis=0).astype(jnp.float32) / 127.0
    depth = jnp.take(arrays["depth"], idx, axis=0).astype(
        jnp.float32) / 1000.0
    pose = jnp.take(arrays["pose"], idx, axis=0)
    data_s = {"rgb": rgb[:, 0], "norm": norm[:, 0], "depth": depth[:, 0]}
    data_t = {"rgb": rgb[:, 1], "norm": norm[:, 1], "depth": depth[:, 1]}
    if "rgb_full" in arrays:  # scannet detection frame
        rgb_full = jnp.take(arrays["rgb_full"], idx, axis=0).astype(
            jnp.float32) / 255.0
        data_s["rgb_full"] = rgb_full[:, 0]
        data_t["rgb_full"] = rgb_full[:, 1]
    T_gt = jnp.einsum("bij,bjk->bik", pose[:, 1],
                      jnp.linalg.inv(pose[:, 0]))
    return data_s, data_t, T_gt


def make_optimizer(cfg: PoseFinetuneConfig):
    return optax.chain(
        optax.zero_nans(),
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adam(cfg.learning_rate),
    )


def make_finetune_step(pipe_cfg: PipelineConfig, hp,
                       cfg: PoseFinetuneConfig):
    """Returns train_step(state, data_s, data_t, T_gt, keys) -> (state,
    metrics); state = {params, anchor_params, opt_state, step}."""
    net = SCNet(output_type=pipe_cfg.output_type,
                snumclass=pipe_cfg.snumclass,
                feature_dim=pipe_cfg.feature_dim, ngf=cfg.ngf,
                dtype=cfg.dtype)
    tx = make_optimizer(cfg)

    def loss_fn(params, anchor, data_s, data_t, T_gt, keys):
        def scnet_fn(x):
            return net.apply({"params": params}, x).astype(jnp.float32)

        def single(ds, dt, k):
            return estimate_pose_via_completion(
                scnet_fn, ds, dt, k, hp, pipe_cfg)

        T = jax.vmap(single)(data_s, data_t, keys)
        rot = jnp.sum((T[:, :3, :3] - T_gt[:, :3, :3]) ** 2, axis=(-2, -1))
        tr = jnp.sum((T[:, :3, 3] - T_gt[:, :3, 3]) ** 2, axis=-1)
        loss = jnp.mean(cfg.rot_weight * rot + cfg.trans_weight * tr)
        metrics = {"loss": loss, "rot_frob2": jnp.mean(rot),
                   "trans_se": jnp.mean(tr)}
        if cfg.anchor_weight > 0.0:
            sq = jax.tree.map(lambda a, b: jnp.sum((a - b) ** 2),
                              params, anchor)
            l_anchor = sum(jax.tree.leaves(sq))
            metrics["anchor_l2"] = l_anchor
            loss = loss + cfg.anchor_weight * l_anchor
        metrics["loss"] = loss
        return loss, metrics

    def train_step(state, data_s, data_t, T_gt, keys):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(
            state["params"], state["anchor_params"], data_s, data_t, T_gt,
            keys)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        metrics["grad_norm"] = gnorm
        return ({"params": params, "anchor_params": state["anchor_params"],
                 "opt_state": opt_state, "step": state["step"] + 1},
                metrics)

    return train_step
