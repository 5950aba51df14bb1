"""Observation masks for partial panoramas.

Re-implements `apply_mask` (util.py:209-232 and the training variant at
mainFeatureLearning.py:39-64): the 'second' method observes the second
160x160 face of the pano; the 'kinect' method observes an 88x66 window
centred in the second face.  Returns the masked input, the observation mask,
and the geometric loss weight `geow`.

Layout is NHWC ([..., H, W, C]) — TPU-native — versus the reference's NCHW.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from relativepose_tpu import config

FACE = config.FACE


@functools.lru_cache(maxsize=None)
def _second_mask_np(h: int = config.PANO_HEIGHT, w: int = config.PANO_WIDTH):
    mask = np.zeros((h, w), dtype=np.float32)
    mask[:, FACE : 2 * FACE] = 1.0
    # exp distance weight outside the observed face (util.py:217-222)
    _, xs = np.meshgrid(range(h), range(w), indexing="ij")
    dist = np.stack(
        [np.abs(xs - FACE), np.abs(xs - 2 * FACE),
         np.abs(xs - w - FACE), np.abs(xs - w - 2 * FACE)], 0
    ).min(0) / float(FACE)
    geow = np.exp(-dist / (2.0 * config.SECOND_MASK_SIGMA**2)).astype(np.float32)
    geow[:, FACE : 2 * FACE] = 0.0
    return mask, geow


@functools.lru_cache(maxsize=None)
def _kinect_mask_np(h: int = config.PANO_HEIGHT, w: int = config.PANO_WIDTH):
    mask = np.zeros((h, w), dtype=np.float32)
    mask[config.KINECT_ROW0 : config.KINECT_ROW1,
         config.KINECT_COL0 : config.KINECT_COL1] = 1.0
    return mask


def observation_mask(method: str, variant: str = "eval"):
    """The [H, W] observation mask and geow for a mask method.

    variant='eval' reproduces util.py:209-232 (kinect geow = 1 - mask);
    variant='train' reproduces mainFeatureLearning.py:39-64 (kinect geow =
    20 inside the window, 1 outside).  For 'second' both variants agree.
    """
    if method == "second":
        mask, geow = _second_mask_np()
        return jnp.asarray(mask), jnp.asarray(geow)
    if method == "kinect":
        mask = _kinect_mask_np()
        if variant == "train":
            geow = mask * 20.0 + (1.0 - mask)
        else:
            geow = 1.0 - mask
        return jnp.asarray(mask), jnp.asarray(geow)
    raise ValueError(f"unknown maskMethod {method!r}")


def apply_mask(x, method: str, variant: str = "eval"):
    """Mask a pano tensor x [..., H, W, C].

    Returns (masked_x, mask [..., H, W, 1], geow [..., H, W, 1]) broadcast
    over the leading batch dims.
    """
    mask, geow = observation_mask(method, variant)
    mask = mask[..., None]
    geow = geow[..., None]
    masked = x * mask
    bshape = x.shape[:-3]
    mask = jnp.broadcast_to(mask, bshape + mask.shape[-3:])
    geow = jnp.broadcast_to(geow, bshape + geow.shape[-3:])
    return masked, mask, geow
