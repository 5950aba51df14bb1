"""Shared conv blocks for the feature / completion networks.

Mirrors the reference's `conv2d` / `deconv2d` builders (model/mymodel.py:
15-39): Conv (or ConvTranspose) + BatchNorm(track_running_stats=False) +
LeakyReLU(0.1).  Notes on the TPU-native translation:

  * layout is NHWC (TPU-native) instead of torch NCHW;
  * `track_running_stats=False` means the reference normalizes with BATCH
    statistics in train AND eval, so `BatchNorm2d` here always computes
    batch moments — no running-average state to thread around (and no
    cross-device psum needed for correctness parity, though `axis_name`
    can be passed to sync statistics across a data-parallel mesh);
  * ConvTranspose2d(k, s, p) output geometry ((in-1)*s - 2p + k) is
    reproduced with an input-dilated convolution, pad = k - 1 - p;
  * compute dtype is configurable (bfloat16 on the MXU; params stay f32).
"""

from __future__ import annotations

import functools as _functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class BatchNorm2d(nn.Module):
    """Batch normalization with batch statistics only (no running stats).

    Matches torch BatchNorm2d(track_running_stats=False): normalize each
    channel with the current batch's mean/var over (N, H, W), with learned
    scale/bias.  If `axis_name` is set, moments are averaged across that
    mapped device axis.
    """

    eps: float = 1e-5
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None
    frozen: bool = False

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.normal(0.02, jnp.float32),
                           (x.shape[-1],))
        # reference init: BN weight ~ N(1.0, 0.02), bias 0 (mymodel.py:11-13)
        scale = scale + 1.0
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        if self.frozen:
            # Running-stats (torch eval-mode) BN folded into an affine:
            # torch_import folds (running_mean, running_var, weight, bias)
            # into (scale, bias) so y = x * scale + bias exactly matches
            # torchvision BN in eval mode (track_running_stats=True).
            y = x.astype(jnp.float32) * scale + bias
            return y.astype(self.dtype or x.dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
        if self.axis_name is not None:
            mean = jax.lax.pmean(mean, self.axis_name)
            var = jax.lax.pmean(var, self.axis_name)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(self.dtype or x.dtype)


class ConvBlock(nn.Module):
    """conv2d builder (mymodel.py:15-26): Conv + [BN] + LeakyReLU(0.1)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    batchnorm: bool = True
    act: bool = True
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        p = self.padding
        k = self.kernel_size
        ks = tuple(k) if isinstance(k, (tuple, list)) else (k, k)
        x = nn.Conv(
            self.features,
            ks,
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=not self.batchnorm,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_normal(),
        )(x)
        if self.batchnorm:
            x = BatchNorm2d(dtype=self.dtype, axis_name=self.axis_name)(x)
        if self.act:
            x = nn.leaky_relu(x, 0.1)
        return x


class DeconvBlock(nn.Module):
    """deconv2d builder (mymodel.py:28-39) with torch ConvTranspose geometry.

    Output spatial size = (in - 1) * stride - 2 * padding + kernel, realized
    as a stride-1 conv over the stride-dilated input with edge padding
    kernel - 1 - padding.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    batchnorm: bool = True
    act: bool = True
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        kh, kw = tuple(k) if isinstance(k, (tuple, list)) else (k, k)
        pads = (kh - 1 - p, kw - 1 - p)
        assert min(pads) >= 0, "unsupported ConvTranspose geometry"
        kernel = self.param(
            "kernel", nn.initializers.xavier_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32)
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(1, 1),
            padding=((pads[0], pads[0]), (pads[1], pads[1])),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.batchnorm:
            y = BatchNorm2d(dtype=self.dtype, axis_name=self.axis_name)(y)
        else:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        if self.act:
            y = nn.leaky_relu(y, 0.1)
        return y


def _resize_matrix(n_in: int, n_out: int):
    """Dense bilinear interpolation matrix [n_out, n_in], half-pixel
    centers, no antialias (each row has <= 2 nonzeros, edge-clamped)."""
    import numpy as np
    src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = (src - i0).astype(np.float32)
    w = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    w[rows, np.clip(i0, 0, n_in - 1)] += 1.0 - frac
    w[rows, np.clip(i0 + 1, 0, n_in - 1)] += frac
    return w


@_functools.lru_cache(maxsize=None)
def _resize_matrices(h_in, w_in, h_out, w_out):
    return _resize_matrix(h_in, h_out), _resize_matrix(w_in, w_out)


def resize_bilinear(x, size):
    """Bilinear resize to (H, W) with half-pixel centers.

    Equivalent to torch `upsample(..., mode='bilinear',
    align_corners=False)` used throughout the reference
    (mymodel.py:105-112, :261, :379).  antialias=False because torch's
    bilinear upsample never low-pass filters, even when downscaling
    (SCNet's 640->224 input resize) — required for converted-weight
    output parity.

    Implemented as two dense interpolation-matrix contractions (one per
    axis) instead of jax.image.resize: the weights are static so the
    resize rides the MXU as plain matmuls — measurably cheaper than the
    gather lowering for the [2B, 224, 224, 54] <-> [2B, 160, 640, *]
    buffers on the SCNet hot path, in the same activation dtype.
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == tuple(size):
        return x
    ah_np, aw_np = _resize_matrices(h_in, w_in, size[0], size[1])
    ah = jnp.asarray(ah_np, dtype=x.dtype)
    aw = jnp.asarray(aw_np, dtype=x.dtype)
    y = jnp.einsum("oh,...hwc->...owc", ah, x,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("pw,...owc->...opc", aw, y,
                      precision=jax.lax.Precision.HIGHEST)
