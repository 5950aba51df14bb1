"""Oracle completion: a drop-in `scnet_fn` built from ground-truth panos.

Produces the same channel layout as SCNet but with ground-truth rgb /
normal / depth, one-hot semantics, and procedural photo-consistent
descriptors (a fixed random projection of multi-scale color).  Used to
test and benchmark the recurrent pipeline end-to-end without trained
weights: with a perfect "completion", pose recovery quality isolates the
warp -> keypoint -> match -> solve stages.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from relativepose_tpu.config import ChannelLayout
from relativepose_tpu.match.keypoints import _blur


def procedural_descriptors(rgb, feature_dim: int = 32, seed: int = 7):
    """Photo-consistent descriptors from multi-scale color. rgb: [H, W, 3]
    in [0, 1] -> [H, W, feature_dim] in (-1, 1)."""
    feats = [rgb]
    for sigma in (2.0, 6.0):
        feats.append(jnp.stack(
            [_blur(rgb[..., c], sigma) for c in range(3)], -1))
    v = jnp.concatenate(feats, -1)  # [H, W, 9]
    proj = jnp.asarray(
        np.random.RandomState(seed).randn(9, feature_dim) / 3.0,
        dtype=rgb.dtype)
    return jnp.tanh(v @ proj)


def make_oracle_completion_fn(data_s, data_t, layout: ChannelLayout):
    """Returns scnet_fn: [2, H, W, 16] -> [2, H, W, layout.num_output]
    that ignores its input and emits the GT channels of (view_s, view_t)."""

    def gt_channels(d):
        chans = []
        sp = layout.spans
        if "rgb" in sp:
            chans.append(d["rgb"])
        if "n" in sp:
            chans.append(d["norm"])
        if "d" in sp:
            chans.append(d["depth"][..., None])
        if "k" in sp:
            chans.append(jnp.zeros_like(d["depth"][..., None]))
        if "s" in sp:
            n_cls = sp["s"][1] - sp["s"][0]
            chans.append(jax.nn.one_hot(d["segm"], n_cls, dtype=d["rgb"].dtype))
        if "f" in sp:
            n_f = sp["f"][1] - sp["f"][0]
            chans.append(procedural_descriptors(d["rgb"], n_f))
        return jnp.concatenate(chans, -1)

    out = jnp.stack([gt_channels(data_s), gt_channels(data_t)])

    def scnet_fn(x):
        del x
        return out

    return scnet_fn
