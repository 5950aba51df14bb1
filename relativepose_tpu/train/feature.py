"""Feature-learning training step (mainFeatureLearning.py:377-464).

Trains Resnet18_8s (+ segmentation head) with the contrastive
correspondence loss on COMPLETE panoramas: both views are fed unmasked,
features are pulled together at 2000 GT correspondences and pushed apart
from random negatives; optional segmentation CE x0.1.

Optimizer: Adam(2e-4, betas=(0.5, 0.999)) (mainFeatureLearning.py:121).
The reference skips the update when a batch has no valid correspondence
set (mainFeatureLearning.py:461-464); here gradients are scaled by that
validity, which is equivalent.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from relativepose_tpu.models import Resnet18_8s, SegmentationHead
from relativepose_tpu.train import losses


@dataclasses.dataclass(frozen=True)
class FeatureTrainConfig:
    snumclass: int = 15
    feature_dim: int = 32
    use_tanh: bool = True
    margin: float = 0.5            # opts.py --D default
    # mine the hardest negatives instead of uniform-random ones (see
    # losses.contrastive_loss; False = exact reference loss)
    hard_negatives: bool = True
    featlearn_segm: bool = False   # opts.py --featlearnSegm
    learning_rate: float = 2e-4
    b1: float = 0.5
    b2: float = 0.999
    base_width: int = 64   # shrink for cheap tests
    dtype: Any = None


def build_models(cfg: FeatureTrainConfig):
    net_f = Resnet18_8s(num_input=7, feature_dim=cfg.feature_dim,
                        use_tanh=cfg.use_tanh, base_width=cfg.base_width,
                        dtype=cfg.dtype)
    seg = SegmentationHead(num_classes=cfg.snumclass, dtype=cfg.dtype)
    return net_f, seg


def init_state(key, cfg: FeatureTrainConfig):
    net_f, seg = build_models(cfg)
    k1, k2 = jax.random.split(key)
    x = jnp.zeros((1, 160, 640, 7))
    params = {
        "net_f": net_f.init(k1, x)["params"],
        "seg": seg.init(k2, jnp.zeros((1, 160, 640, cfg.feature_dim)))[
            "params"],
    }
    tx = optax.adam(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2)
    return {"params": params, "opt_state": tx.init(params), "step": 0}


def loss_fn(params, batch, key, cfg: FeatureTrainConfig):
    """batch: rgb [n, 2, H, W, 3], norm [n, 2, H, W, 3], depth [n, 2, H, W],
    dataMask [n, 2, H, W, 1], segm [n, 2, H, W], denseCorres dict with
    leading [n] batch dim."""
    net_f, seg = build_models(cfg)
    n = batch["rgb"].shape[0]

    def pack(v):  # [n, 2, ...] -> [2n, ...] with view-major order
        return jnp.concatenate([batch[v][:, 0], batch[v][:, 1]], axis=0)

    complete = jnp.concatenate(
        [pack("rgb"), pack("norm"), pack("depth")[..., None]], axis=-1)
    feat = net_f.apply({"params": params["net_f"]}, complete)
    loss_fl, loss_pos, loss_neg = losses.contrastive_loss(
        feat[:n], feat[n:], batch["denseCorres"], key, cfg.margin,
        hard_negatives=cfg.hard_negatives)
    metrics = {"loss_fl": loss_fl, "loss_fl_pos": loss_pos,
               "loss_fl_neg": loss_neg}
    total = loss_fl
    if cfg.featlearn_segm:
        seg_pred = seg.apply({"params": params["seg"]}, feat)
        loss_s = losses.weighted_ce(seg_pred, pack("segm"), pack("dataMask"))
        metrics["loss_s"] = loss_s
        total = total + loss_s
    metrics["loss"] = total
    return total, metrics


def make_train_step(cfg: FeatureTrainConfig):
    tx = optax.adam(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2)

    def train_step(state, batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state["params"], batch, key, cfg)
        # skip the update when no sample has valid correspondences
        any_valid = (jnp.sum(batch["denseCorres"]["valid"]) > 0).astype(
            jnp.float32)
        grads = jax.tree.map(lambda g: g * any_valid, grads)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        return ({"params": params, "opt_state": opt_state,
                 "step": state["step"] + 1}, metrics)

    return train_step
