"""Torch checkpoint -> Flax parameter converter.

The reference ships torch `state_dict` checkpoints
(`data/pretrained_model/<ds>.{feat,comp}.pth.tar`, evaluation.py:143-150).
For error-parity with trained reference models this module maps those
tensors onto our Flax module trees:

  * Conv2d weight  [O, I, kH, kW] -> [kH, kW, I, O]
  * ConvTranspose2d weight [I, O, kH, kW] -> spatially flipped
    [kH, kW, I, O] (our DeconvBlock is an input-dilated conv with a
    NON-flipped kernel, so the torch kernel must be flipped; see
    tests/test_models.py::test_deconv_matches_torch)
  * BatchNorm weight/bias -> scale-1.0 / bias (our BatchNorm2d stores
    `scale` with an implicit +1)

The SCNet/ResNet layer-name maps cover the reference's architectures; a
generic `convert_conv`/`convert_deconv` pair is exposed for custom nets.
"""

from __future__ import annotations

import numpy as np


def convert_conv(w):
    """torch Conv2d [O, I, kH, kW] -> flax [kH, kW, I, O]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def convert_deconv(w):
    """torch ConvTranspose2d [I, O, kH, kW] -> our DeconvBlock kernel
    [kH, kW, I, O], spatially flipped."""
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def convert_bn(weight, bias):
    """torch BatchNorm (weight, bias) -> our (scale, bias) with scale
    storing weight - 1 (blocks.BatchNorm2d adds 1.0)."""
    return np.asarray(weight) - 1.0, np.asarray(bias)


def load_torch_state_dict(path):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() for k, v in sd.items()}


def _assign(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def import_scnet_sequential_block(sd, torch_prefix, flax_tree, flax_name,
                                  deconv=False, batchnorm=True):
    """Map one reference conv2d/deconv2d Sequential block
    (mymodel.py:15-39: [conv, bn?, lrelu]) onto a ConvBlock/DeconvBlock."""
    w = sd[f"{torch_prefix}.0.weight"]
    kernel = convert_deconv(w) if deconv else convert_conv(w)
    sub = {}
    if deconv:
        sub["kernel"] = kernel
    else:
        sub["Conv_0"] = {"kernel": kernel}
    if batchnorm:
        scale, bias = convert_bn(sd[f"{torch_prefix}.1.weight"],
                                 sd[f"{torch_prefix}.1.bias"])
        sub["BatchNorm2d_0"] = {"scale": scale, "bias": bias}
    else:
        bias = np.asarray(sd[f"{torch_prefix}.0.bias"])
        if deconv:
            sub["bias"] = bias
        else:
            sub["Conv_0"]["bias"] = bias
    flax_tree[flax_name] = sub
    return flax_tree


def import_head_conv(sd, torch_name, flax_tree, flax_name):
    """Plain 1x1 Conv2d head (deconv1rgb etc., mymodel.py:188)."""
    flax_tree[flax_name] = {
        "kernel": convert_conv(sd[f"{torch_name}.weight"]),
        "bias": np.asarray(sd[f"{torch_name}.bias"]),
    }
    return flax_tree
