"""Pano-completion training step (mainPanoCompletion2view.py:457-585).

Trains SCNet (netG) against a FROZEN pretrained feature net (netF):
  * inputs: each view masked ('second'/'kinect'), paired with either a
    blank counterpart (type 0) or the pose-perturbed warped counterpart
    (type 1) — batch is [s_type0; t_type0; s_type1; t_type1], 4n rows
    (mainPanoCompletion2view.py:496-514);
  * losses: per-modality masked L1 vs the complete GT (geow / dynamic box
    weight / dataMask), CE x0.1 for semantics, feature-consistency vs
    netF(complete), contrastive loss on the completed features of a random
    input type, optional plane-normal loss.

Optimizer: Adam(2e-4, betas=(0.5, 0.999)).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from relativepose_tpu.config import ChannelLayout
from relativepose_tpu.core import masking
from relativepose_tpu.models import Resnet18_8s, SCNet
from relativepose_tpu.train import losses


@dataclasses.dataclass(frozen=True)
class CompletionTrainConfig:
    dataset: str = "suncg"
    mask_method: str = "second"
    output_type: str = "rgbdnsf"
    snumclass: int = 15
    feature_dim: int = 32
    use_tanh: bool = True
    skip_layer: bool = True
    batchnorm: bool = True
    feature_learning: bool = True   # adds loss_fl + loss_fc
    geometric_weight: bool = False  # opts.py --GeometricWeight
    dynamic_weighting: bool = False  # opts.py --dynamicWeighting
    pn_loss: bool = False
    margin: float = 0.5
    hard_negatives: bool = True   # see losses.contrastive_loss
    # Feature-consistency weighting.  'geow' is the reference
    # (mainPanoCompletion2view.py:544): weight ZERO on the observed face,
    # exp-decaying away from the boundary — which leaves the hallucinated
    # descriptors far from the boundary (exactly where 0-0.1-overlap pairs
    # must match) nearly unsupervised.  'uniform' weights every valid
    # pixel equally.  fc_scale multiplies the loss either way.
    fc_weight_mode: str = "geow"
    fc_scale: float = 1.0
    # What the 'f' head regresses to.  'netf' = the reference design
    # (frozen feature net on the complete pano,
    # mainPanoCompletion2view.py:516-544).  'photometric' = the oracle's
    # procedural photo-consistent descriptors of the complete rgb
    # (pipeline/oracle.py) — round 4's hybrid diagnostic measured that
    # even PERFECT prediction of the netF target fails wide-baseline
    # matching (netf_gtgeo row) while photo-consistent descriptors with
    # learned geometry nearly solve the 0-0.1 bucket (pdesc_lgeo row):
    # the descriptor family, not the prediction, was the binding
    # constraint.
    fc_target: str = "netf"
    w_depth: float = 1.0          # depth-L1 multiplier (solver needs cm-
                                  # accurate hallucinated depth for its
                                  # pairwise filters, rpmodule.py:399-404)
    learning_rate: float = 2e-4
    b1: float = 0.5
    b2: float = 0.999
    ngf: int = 64          # shrink for cheap tests
    base_width: int = 64
    # SCNet internal working resolution (models/scnet.py:47); non-default
    # settings trade completion fidelity for throughput (VERDICT r4 #6)
    internal_size: tuple = (224, 224)
    # True when netF comes from a torch checkpoint with running-stats BN
    # (torch_import folds them into a frozen affine)
    feat_frozen_bn: bool = False
    dtype: Any = None

    @property
    def layout(self) -> ChannelLayout:
        return ChannelLayout(self.output_type, self.snumclass,
                             self.feature_dim)


def build_models(cfg: CompletionTrainConfig):
    net_g = SCNet(output_type=cfg.output_type, snumclass=cfg.snumclass,
                  feature_dim=cfg.feature_dim, use_tanh=cfg.use_tanh,
                  skip_layer=cfg.skip_layer, batchnorm=cfg.batchnorm,
                  ngf=cfg.ngf, internal_size=tuple(cfg.internal_size),
                  dtype=cfg.dtype)
    net_f = Resnet18_8s(num_input=7, feature_dim=cfg.feature_dim,
                        use_tanh=cfg.use_tanh, base_width=cfg.base_width,
                        frozen_bn=cfg.feat_frozen_bn, dtype=cfg.dtype)
    return net_g, net_f


def init_state(key, cfg: CompletionTrainConfig, net_f_params=None):
    """net_f_params: pretrained frozen feature-net params (a fresh init is
    used if omitted — fine for tests, not for real training)."""
    net_g, net_f = build_models(cfg)
    k1, k2 = jax.random.split(key)
    params_g = net_g.init(k1, jnp.zeros((1, 160, 640, 16)))["params"]
    if net_f_params is None:
        net_f_params = net_f.init(k2, jnp.zeros((1, 160, 640, 7)))["params"]
    tx = optax.adam(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2)
    return {"params": params_g, "net_f_params": net_f_params,
            "opt_state": tx.init(params_g), "step": 0}


def _assemble_views(batch, cfg: CompletionTrainConfig):
    """Build the 4n-row input stack + broadcast loss weights."""
    n = batch["rgb"].shape[0]

    def pack(v):  # [n, 2, ...] -> [2n, ...]
        return jnp.concatenate([batch[v][:, 0], batch[v][:, 1]], axis=0)

    complete = jnp.concatenate(
        [pack("rgb"), pack("norm"), pack("depth")[..., None]], axis=-1)
    view, mask, geow = masking.apply_mask(
        complete, cfg.mask_method, variant="train")
    view = jnp.concatenate([view, mask], axis=-1)  # [2n, H, W, 8]
    warped = pack("proj_view8")  # [2n, H, W, 8] (t2s for view0, s2t for 1)

    type0 = jnp.concatenate([view, jnp.zeros_like(view)], axis=-1)
    type1 = jnp.concatenate([view, warped], axis=-1)
    view4n = jnp.concatenate([type0, type1], axis=0)  # [4n, H, W, 16]

    rep2 = lambda x: jnp.concatenate([x, x], axis=0)
    data_mask = rep2(pack("dataMask"))
    geow4 = rep2(geow[..., :1])
    complete4 = rep2(complete)
    if cfg.dynamic_weighting:
        box = rep2(pack("proj_box")[..., None])
        dynamic_w = jnp.where(box == 0, 0.2, 1.0)
    else:
        dynamic_w = 1.0
    if cfg.geometric_weight:
        total_weight = geow4 * dynamic_w * data_mask
    else:
        total_weight = dynamic_w * data_mask
    segm4 = rep2(pack("segm")) if "segm" in batch else None
    return dict(n=n, view4n=view4n, complete4=complete4,
                data_mask=data_mask, geow4=geow4,
                total_weight=total_weight, segm4=segm4)


def loss_fn(params_g, net_f_params, batch, key, cfg: CompletionTrainConfig):
    net_g, net_f = build_models(cfg)
    lay = cfg.layout
    a = _assemble_views(batch, cfg)
    n = a["n"]

    fake = net_g.apply({"params": params_g}, a["view4n"])  # [4n, H, W, C]
    metrics = {}
    total = 0.0

    sp = lay.spans
    gt = {"rgb": a["complete4"][..., 0:3], "n": a["complete4"][..., 3:6],
          "d": a["complete4"][..., 6:7]}
    for m in ("rgb", "n", "d"):
        if m in sp:
            lo, hi = sp[m]
            l = losses.masked_l1(fake[..., lo:hi], gt[m], a["total_weight"])
            metrics[f"loss_{m}"] = l
            total = total + (cfg.w_depth * l if m == "d" else l)
    if "s" in sp and a["segm4"] is not None:
        lo, hi = sp["s"]
        l = losses.weighted_ce(fake[..., lo:hi], a["segm4"],
                               a["total_weight"])
        metrics["loss_s"] = l
        total = total + l

    if cfg.feature_learning and "f" in sp:
        lo, hi = sp["f"]
        k1, k2, k3 = jax.random.split(key, 3)
        if cfg.fc_target == "photometric":
            from relativepose_tpu.pipeline.oracle import (
                procedural_descriptors,
            )
            fakec = jax.vmap(
                lambda rgb: procedural_descriptors(rgb, hi - lo))(
                jnp.concatenate([a["complete4"][:2 * n, ..., 0:3]] * 2,
                                axis=0))
        else:
            fakec = net_f.apply(
                {"params": jax.lax.stop_gradient(net_f_params)},
                jnp.concatenate([a["complete4"][:2 * n]] * 2, axis=0))
        fc_w = (a["geow4"] if cfg.fc_weight_mode == "geow"
                else jnp.ones_like(a["geow4"]))
        loss_fc = cfg.fc_scale * losses.feature_consistency_loss(
            fake[..., lo:hi], fakec, a["data_mask"], fc_w)
        # contrastive on a random input type (type 0 or 1), p = 0.5
        use_type1 = jax.random.bernoulli(k1)
        f_s = jnp.where(use_type1, 1.0, 0.0)
        feat_s = jnp.where(use_type1[..., None, None, None],
                           fake[2 * n:3 * n, ..., lo:hi],
                           fake[0:n, ..., lo:hi])
        feat_t = jnp.where(use_type1[..., None, None, None],
                           fake[3 * n:4 * n, ..., lo:hi],
                           fake[n:2 * n, ..., lo:hi])
        loss_fl, loss_pos, loss_neg = losses.contrastive_loss(
            feat_s, feat_t, batch["denseCorres"], k2, cfg.margin,
            hard_negatives=cfg.hard_negatives)
        metrics.update(loss_fc=loss_fc, loss_fl=loss_fl,
                       loss_fl_pos=loss_pos, loss_fl_neg=loss_neg,
                       used_type1=f_s)
        total = total + loss_fl + loss_fc

    if cfg.pn_loss:
        lo_n = sp["n"][0]
        lo_d = sp["d"][0]
        depth_gt = jnp.concatenate(
            [batch["depth"][:, 0], batch["depth"][:, 1]], 0)
        depth_gt = jnp.concatenate([depth_gt, depth_gt], 0)
        loss_pn = losses.plane_normal_loss(
            depth_gt, fake[..., lo_n:lo_n + 3], fake[..., lo_d] * 4.0,
            cfg.dataset)
        metrics["loss_pn"] = loss_pn
        total = total + loss_pn

    metrics["loss"] = total
    return total, metrics


def make_train_step(cfg: CompletionTrainConfig):
    tx = optax.adam(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2)

    def train_step(state, batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(
            state["params"], state["net_f_params"], batch, key, cfg)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        return ({"params": params, "net_f_params": state["net_f_params"],
                 "opt_state": opt_state, "step": state["step"] + 1}, metrics)

    return train_step
