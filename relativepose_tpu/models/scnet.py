"""SCNet — the 2-view pano scene-completion U-Net.

Flax re-design of model/mymodel.py:141-380.  Input is a 16-channel pano:
the view's own [rgb(3), normal(3), depth(1), mask(1)] concatenated with the
warped counterpart's 8 channels (rpmodule.py:619-620).  Internally resized
to 224x224 (mymodel.py:261) and back on output (mymodel.py:379).

Architecture (mymodel.py:151-231):
  * three modality-specific encoder stems (rgb / normal / depth), each
    taking [modality, mask] (4 or 2 ch), SHARED between the own view and the
    warped counterpart (same weights applied to both, mymodel.py:266-288);
  * trunk conv4..conv9 down to ngf*16 x 1 x 1;
  * decoder deconv9..deconv4 with skip concatenation (when skip_layer);
  * per-modality output heads gated by `output_type`: rgb(3), n(3), d(1),
    k(1), s(snumclass), f(32, optional tanh), concatenated in that fixed
    order (mymodel.py:378).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from relativepose_tpu.models.blocks import ConvBlock, DeconvBlock, resize_bilinear

Dtype = Any


class SCNet(nn.Module):
    output_type: str = "rgbdnsf"
    snumclass: int = 15
    feature_dim: int = 32
    ngf: int = 64
    batchnorm: bool = True
    skip_layer: bool = True
    use_tanh: bool = True
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None
    # Internal working resolution (mymodel.py:261 hardcodes 224).  Must be
    # a multiple of 32 per axis >= 64 (the trunk ladder reaches 7x7-ish
    # before the 3/3/3 bottleneck convs only for 224; other sizes use the
    # same conv stack — sizes are never hardcoded below).  224x224 HALVES
    # the pano's pixel count (50k vs 102k), which is why the reference's
    # resize is kept as the default rather than running native 160x640.
    internal_size: tuple = (224, 224)

    @property
    def num_output(self):
        from relativepose_tpu.config import ChannelLayout
        return ChannelLayout(self.output_type, self.snumclass,
                             self.feature_dim).num_output

    @nn.compact
    def __call__(self, x):
        """x: [N, H, W, 16] -> [N, H, W, num_output]."""
        in_hw = x.shape[-3:-1]
        ngf, bn = self.ngf, self.batchnorm
        dt, ax = self.dtype, self.axis_name
        kw = dict(batchnorm=bn, dtype=dt, axis_name=ax)

        x = resize_bilinear(x, tuple(self.internal_size))
        rgb = jnp.concatenate([x[..., 0:3], x[..., 7:8]], -1)
        nrm = jnp.concatenate([x[..., 3:6], x[..., 7:8]], -1)
        dep = jnp.concatenate([x[..., 6:7], x[..., 7:8]], -1)
        rgb_w = jnp.concatenate([x[..., 8:11], x[..., 15:16]], -1)
        nrm_w = jnp.concatenate([x[..., 11:14], x[..., 15:16]], -1)
        dep_w = jnp.concatenate([x[..., 14:15], x[..., 15:16]], -1)

        conv1rgb = ConvBlock(ngf // 2, 3, 1, 1, **kw)
        conv2rgb = ConvBlock(ngf, 4, 2, 1, **kw)
        conv3rgb = ConvBlock(ngf * 2, 4, 2, 1, **kw)
        conv1n = ConvBlock(ngf // 2, 3, 1, 1, **kw)
        conv2n = ConvBlock(ngf, 4, 2, 1, **kw)
        conv3n = ConvBlock(ngf * 2, 4, 2, 1, **kw)
        conv1d = ConvBlock(ngf // 2, 3, 1, 1, **kw)
        conv2d = ConvBlock(ngf, 4, 2, 1, **kw)
        conv3d = ConvBlock(ngf * 2, 4, 2, 1, **kw)

        # own view stems
        xr1 = conv1rgb(rgb); xr2 = conv2rgb(xr1); xr3 = conv3rgb(xr2)
        xn1 = conv1n(nrm); xn2 = conv2n(xn1); xn3 = conv3n(xn2)
        xd1 = conv1d(dep); xd2 = conv2d(xd1); xd3 = conv3d(xd2)
        # warped-counterpart stems (same weights, mymodel.py:278-288)
        wr3 = conv3rgb(conv2rgb(conv1rgb(rgb_w)))
        wn3 = conv3n(conv2n(conv1n(nrm_w)))
        wd3 = conv3d(conv2d(conv1d(dep_w)))

        xin = jnp.concatenate([xr3, wr3, xn3, wn3, xd3, wd3], -1)

        x4 = ConvBlock(ngf * 4, 4, 2, 1, **kw)(xin)   # 28
        x5 = ConvBlock(ngf * 8, 4, 2, 1, **kw)(x4)    # 14
        x6 = ConvBlock(ngf * 8, 4, 2, 1, **kw)(x5)    # 7

        skip = self.skip_layer

        def up(feat, prev_skip, block):
            if skip and prev_skip is not None:
                feat = jnp.concatenate([feat, prev_skip], -1)
            return block(feat)

        if tuple(self.internal_size) == (224, 224):
            # the reference's bottleneck ladder (valid only for /32 == 7)
            x7 = ConvBlock(ngf * 8, 3, 2, 0, **kw)(x6)    # 3
            x8 = ConvBlock(ngf * 8, 3, 1, 1, **kw)(x7)    # 3
            x9 = ConvBlock(ngf * 16, 3, 1, 0, **kw)(x8)   # 1
            dx9 = DeconvBlock(ngf * 8, 3, 1, 0, **kw)(x9)
            dx8 = up(dx9, x8, DeconvBlock(ngf * 8, 3, 1, 1, **kw))
            dx7 = up(dx8, x7, DeconvBlock(ngf * 8, 3, 2, 0, **kw))
        else:
            # generalized global bottleneck for other working sizes: one
            # full-extent conv to a 1x1 scene code and its transpose back
            # (replaces the 3/3/3 ladder, whose geometry only closes at
            # 224; the two dropped 3x3 convs at 3x3 resolution are
            # negligible capacity)
            s_h, s_w = x6.shape[-3], x6.shape[-2]
            x9 = ConvBlock(ngf * 16, (s_h, s_w), 1, 0, **kw)(x6)   # 1x1
            dx7 = DeconvBlock(ngf * 8, (s_h, s_w), 1, 0, **kw)(x9)
        dx6 = up(dx7, x6, DeconvBlock(ngf * 8, 4, 2, 1, **kw))
        dx5 = up(dx6, x5, DeconvBlock(ngf * 4, 4, 2, 1, **kw))
        dx4 = up(dx5, x4, DeconvBlock(ngf * 2, 4, 2, 1, **kw))

        outs = []
        ot = self.output_type

        def head(skip3, skip2, skip1, out_ch):
            """Per-modality decoder head with encoder skips
            (mymodel.py:309-331)."""
            d3 = up(dx4, skip3, DeconvBlock(ngf, 4, 2, 1, **kw))
            d2 = up(d3, skip2, DeconvBlock(ngf // 2, 4, 2, 1, **kw))
            if skip and skip1 is not None:
                d2 = jnp.concatenate([d2, skip1], -1)
            return nn.Conv(out_ch, (1, 1), dtype=dt,
                           kernel_init=nn.initializers.xavier_normal())(d2)

        def plain_head(out_ch):
            """s / f heads have no encoder skips (mymodel.py:364-376)."""
            d3 = DeconvBlock(ngf, 4, 2, 1, **kw)(dx4)
            d2 = DeconvBlock(ngf, 4, 2, 1, **kw)(d3)
            return nn.Conv(out_ch, (1, 1), dtype=dt,
                           kernel_init=nn.initializers.xavier_normal())(d2)

        if "rgb" in ot:
            outs.append(head(xr3, xr2, xr1, 3))
        if "n" in ot.replace("rgb", ""):
            outs.append(head(xn3, xn2, xn1, 3))
        if "d" in ot:
            outs.append(head(xd3, xd2, xd1, 1))
        if "k" in ot:
            outs.append(head(None, None, None, 1))
        if "s" in ot:
            outs.append(plain_head(self.snumclass))
        if "f" in ot:
            f = plain_head(self.feature_dim)
            if self.use_tanh:
                f = jnp.tanh(f)
            outs.append(f)

        out = jnp.concatenate(outs, -1)
        return resize_bilinear(out, in_hw)
