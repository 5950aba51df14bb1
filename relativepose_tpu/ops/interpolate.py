"""Bilinear sampling of dense maps at sub-pixel points.

Re-implements rputil.py:43-58 (`interpolate`): sample a [H, W, C] map at
normalized points [K, 2] (x, y in [0, 1]) using the reference's exact
convention x_px = x * (W-1), 4-tap bilinear with floor anchors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpolate_normalized(feat_hwc, pts_norm):
    """feat_hwc: [H, W, C]; pts_norm: [K, 2] with (x, y) in [0, 1].

    Returns [K, C].  Matches rputil.py:43-58 (which indexes y0+1/x0+1
    unguarded; we clip, which only differs for points exactly on the last
    row/col where the reference would read out of bounds).
    """
    h, w = feat_hwc.shape[0], feat_hwc.shape[1]
    x = pts_norm[:, 0] * (w - 1)
    y = pts_norm[:, 1] * (h - 1)
    return interpolate_pixels(feat_hwc, jnp.stack([x, y], axis=-1))


def interpolate_pixels(feat_hwc, pts_px):
    """Bilinear sample at pixel coords pts_px [K, 2] (x, y)."""
    h, w = feat_hwc.shape[0], feat_hwc.shape[1]
    x = pts_px[:, 0]
    y = pts_px[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    xi = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    xi1 = jnp.clip(xi + 1, 0, w - 1)
    yi1 = jnp.clip(yi + 1, 0, h - 1)
    wx1 = (x - x0)[:, None]
    wy1 = (y - y0)[:, None]
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    return (
        feat_hwc[yi, xi] * wy0 * wx0
        + feat_hwc[yi1, xi] * wy1 * wx0
        + feat_hwc[yi, xi1] * wy0 * wx1
        + feat_hwc[yi1, xi1] * wy1 * wx1
    )


interpolate_normalized_batched = jax.vmap(interpolate_normalized, in_axes=(0, 0))
