"""Resnet18_8s feature network (FCN-8s head over a ResNet-18 trunk).

Flax re-design of model/mymodel.py:41-122: a ResNet-18 whose first conv
takes `num_input` channels (7 = rgb+normal+depth, mymodel.py:57), with 1x1
"score" convs producing 32-channel maps at strides 8/16/32
(mymodel.py:65-75), top-down additive fusion through bilinear upsampling
(mymodel.py:105-112), a final upsample to the input resolution, and an
optional tanh (mymodel.py:120-121).

The reference loads ImageNet weights from a forked torchvision; this
implementation trains from scratch (or loads converted torch weights via
`relativepose_tpu.utils.torch_import`).  Batch norms use batch statistics
(see blocks.BatchNorm2d).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from relativepose_tpu.models.blocks import BatchNorm2d, resize_bilinear

Dtype = Any


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        bn_kw = dict(dtype=self.dtype, axis_name=self.axis_name,
                     frozen=self.frozen_bn)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.xavier_normal())(x)
        y = BatchNorm2d(**bn_kw)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.xavier_normal())(y)
        y = BatchNorm2d(**bn_kw)(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               kernel_init=nn.initializers.xavier_normal())(x)
            residual = BatchNorm2d(**bn_kw)(residual)
        return nn.relu(y + residual)


class Resnet18_8s(nn.Module):
    num_input: int = 7
    feature_dim: int = 32
    use_tanh: bool = True
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    base_width: int = 64  # stage widths are (w, 2w, 4w, 8w)
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None
    # Use folded torch eval-mode running-stats BN (see torch_import):
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x):
        """x: [N, H, W, num_input] -> [N, H, W, feature_dim]."""
        in_hw = x.shape[-3:-1]
        dt, ax = self.dtype, self.axis_name
        w0 = self.base_width
        y = nn.Conv(w0, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=dt,
                    kernel_init=nn.initializers.xavier_normal())(x)
        y = BatchNorm2d(dtype=dt, axis_name=ax, frozen=self.frozen_bn)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = (w0, 2 * w0, 4 * w0, 8 * w0)
        scores = {}
        for stage, (p, blocks) in enumerate(zip(planes, self.stage_sizes)):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                y = BasicBlock(p, stride, dtype=dt, axis_name=ax,
                               frozen_bn=self.frozen_bn)(y)
            if stage == 1:
                scores[8] = nn.Conv(self.feature_dim, (1, 1), dtype=dt)(y)
            elif stage == 2:
                scores[16] = nn.Conv(self.feature_dim, (1, 1), dtype=dt)(y)
            elif stage == 3:
                scores[32] = nn.Conv(self.feature_dim, (1, 1), dtype=dt)(y)

        logits16 = scores[16] + resize_bilinear(
            scores[32], scores[16].shape[-3:-1])
        logits8 = scores[8] + resize_bilinear(logits16, scores[8].shape[-3:-1])
        out = resize_bilinear(logits8, in_hw)
        if self.use_tanh:
            out = jnp.tanh(out)
        return out


class SegmentationHead(nn.Module):
    """1x1 conv feature-map -> class logits (mymodel.py:126-139)."""

    num_classes: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feat):
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(feat)
