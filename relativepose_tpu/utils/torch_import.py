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
  * BatchNorm(track_running_stats=False) weight/bias -> scale-1.0 / bias
    (our BatchNorm2d stores `scale` with an implicit +1); this is the
    SCNet flavour (mymodel.py:19,32) which uses batch stats at eval too.
  * BatchNorm with running stats (the torchvision ResNet-18 trunk inside
    Resnet18_8s) -> eval-mode affine fold: scale = w/sqrt(rv+eps),
    bias = b - rm*scale, consumed by `BatchNorm2d(frozen=True)`
    (Resnet18_8s(frozen_bn=True)).

Entry points:

  * ``import_resnet18_8s(sd, feature_dim=32)`` — full state-dict map for
    the reference feature net (mymodel.py:41-122; torch names
    ``resnet18_32s.conv1/bn1/layer{1..4}.{0,1}.*``, ``score_{8,16,32}s``).
  * ``import_scnet(sd, output_type, snumclass, ...)`` — full state-dict
    map for the completion U-Net (mymodel.py:141-380; torch names
    ``conv{1..3}{rgb,n,d}``, ``conv4..conv9``, ``deconv9..deconv4``,
    ``deconv{3,2,1}{rgb,n,d,k,s,f}``).
  * ``import_segmentation_head(sd)`` — mymodel.py:126-139.

All converters accept an optional ``template`` params tree (from
``net.init``) and verify produced leaf shapes against it.
"""

from __future__ import annotations

import numpy as np

BN_EPS = 1e-5  # torch BatchNorm2d default


def convert_conv(w):
    """torch Conv2d [O, I, kH, kW] -> flax [kH, kW, I, O]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def convert_deconv(w):
    """torch ConvTranspose2d [I, O, kH, kW] -> our DeconvBlock kernel
    [kH, kW, I, O], spatially flipped."""
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def convert_bn(weight, bias):
    """torch BatchNorm(track_running_stats=False) (weight, bias) -> our
    (scale, bias) with scale storing weight - 1 (BatchNorm2d adds 1.0)."""
    return np.asarray(weight, np.float32) - 1.0, np.asarray(bias, np.float32)


def fold_bn_eval(weight, bias, running_mean, running_var, eps=BN_EPS):
    """Fold torch eval-mode BN (running stats) into (scale-1, bias) for
    BatchNorm2d(frozen=True): y = x*scale' + bias' with
    scale' = w/sqrt(rv+eps), bias' = b - rm*scale'."""
    w = np.asarray(weight, np.float64)
    b = np.asarray(bias, np.float64)
    rm = np.asarray(running_mean, np.float64)
    rv = np.asarray(running_var, np.float64)
    scale = w / np.sqrt(rv + eps)
    return ((scale - 1.0).astype(np.float32),
            (b - rm * scale).astype(np.float32))


def load_torch_state_dict(path):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):  # DataParallel prefix (opts.py:30)
            k = k[len("module."):]
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


def _bn_from(sd, prefix):
    """BN params at `prefix`: folded if running stats present, else the
    track_running_stats=False flavour."""
    if f"{prefix}.running_mean" in sd:
        scale, bias = fold_bn_eval(
            sd[f"{prefix}.weight"], sd[f"{prefix}.bias"],
            sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"])
    else:
        scale, bias = convert_bn(sd[f"{prefix}.weight"], sd[f"{prefix}.bias"])
    return {"scale": scale, "bias": bias}


def _plain_conv(sd, prefix):
    """Bare nn.Conv2d with bias (score convs, deconv1* heads)."""
    return {"kernel": convert_conv(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _check_template(params, template, path=""):
    """Recursively verify produced tree matches the init template."""
    if template is None:
        return
    pk, tk = set(params), set(template)
    if pk != tk:
        raise ValueError(
            f"torch_import: key mismatch at '{path}': produced "
            f"{sorted(pk - tk)} extra, missing {sorted(tk - pk)}")
    for k in pk:
        p, t = params[k], template[k]
        if isinstance(t, dict):
            _check_template(p, t, f"{path}/{k}")
        elif tuple(np.shape(p)) != tuple(np.shape(t)):
            raise ValueError(
                f"torch_import: shape mismatch at '{path}/{k}': "
                f"{np.shape(p)} vs template {np.shape(t)}")


# ---------------------------------------------------------------------------
# Resnet18_8s (mymodel.py:41-122)
# ---------------------------------------------------------------------------

def import_resnet18_8s(sd, template=None):
    """Full state-dict map for the reference feature net.

    Produces params for ``models.resnet.Resnet18_8s(frozen_bn=True)``
    (the trunk BNs are torchvision-style with running stats; eval-mode
    parity requires the folded-affine form).

    Flax naming (construction order in resnet.py::Resnet18_8s.__call__):
    Conv_0/BatchNorm2d_0 = stem conv1/bn1; BasicBlock_{0..7} =
    layer{1..4}.{0,1}; Conv_1/Conv_2/Conv_3 = score_8s/16s/32s.
    """
    t = "resnet18_32s"
    p = {
        "Conv_0": {"kernel": convert_conv(sd[f"{t}.conv1.weight"])},
        "BatchNorm2d_0": _bn_from(sd, f"{t}.bn1"),
    }
    blk = 0
    for layer in range(1, 5):
        for b in range(2):
            tb = f"{t}.layer{layer}.{b}"
            sub = {
                "Conv_0": {"kernel": convert_conv(sd[f"{tb}.conv1.weight"])},
                "BatchNorm2d_0": _bn_from(sd, f"{tb}.bn1"),
                "Conv_1": {"kernel": convert_conv(sd[f"{tb}.conv2.weight"])},
                "BatchNorm2d_1": _bn_from(sd, f"{tb}.bn2"),
            }
            if f"{tb}.downsample.0.weight" in sd:
                sub["Conv_2"] = {
                    "kernel": convert_conv(sd[f"{tb}.downsample.0.weight"])}
                sub["BatchNorm2d_2"] = _bn_from(sd, f"{tb}.downsample.1")
            p[f"BasicBlock_{blk}"] = sub
            blk += 1
    p["Conv_1"] = _plain_conv(sd, "score_8s")
    p["Conv_2"] = _plain_conv(sd, "score_16s")
    p["Conv_3"] = _plain_conv(sd, "score_32s")
    _check_template(p, template)
    return p


def import_segmentation_head(sd, template=None):
    """segmentation_layer (mymodel.py:126-139) -> SegmentationHead."""
    p = {"Conv_0": _plain_conv(sd, "segm_layer")}
    _check_template(p, template)
    return p


# ---------------------------------------------------------------------------
# SCNet (mymodel.py:141-380)
# ---------------------------------------------------------------------------

def _head_active(output_type):
    """Which per-modality heads exist, in construction order (must mirror
    both mymodel.py:185-231 and scnet.py's head gating)."""
    ot = output_type
    return [m for m, on in (
        ("rgb", "rgb" in ot),
        ("n", "n" in ot.replace("rgb", "")),
        ("d", "d" in ot),
        ("k", "k" in ot),
        ("s", "s" in ot),
        ("f", "f" in ot),
    ) if on]


def scnet_name_map(output_type):
    """torch module name -> (flax module name, kind) for SCNet.

    kind in {conv_block, deconv_block, plain_conv}.  Flax numbering is the
    construction order in scnet.py::SCNet.__call__: ConvBlock_0..8 stems,
    ConvBlock_9..14 trunk conv4..9, DeconvBlock_0..5 trunk deconv9..4,
    then per active head (rgb,n,d,k,s,f) two DeconvBlocks + one Conv.
    """
    m = {}
    stems = ["conv1rgb", "conv2rgb", "conv3rgb",
             "conv1n", "conv2n", "conv3n",
             "conv1d", "conv2d", "conv3d"]
    for i, name in enumerate(stems):
        m[name] = (f"ConvBlock_{i}", "conv_block")
    for i, name in enumerate(["conv4", "conv5", "conv6",
                              "conv7", "conv8", "conv9"]):
        m[name] = (f"ConvBlock_{9 + i}", "conv_block")
    for i, name in enumerate(["deconv9", "deconv8", "deconv7",
                              "deconv6", "deconv5", "deconv4"]):
        m[name] = (f"DeconvBlock_{i}", "deconv_block")
    db, cv = 6, 0
    for mod in _head_active(output_type):
        m[f"deconv3{mod}"] = (f"DeconvBlock_{db}", "deconv_block")
        m[f"deconv2{mod}"] = (f"DeconvBlock_{db + 1}", "deconv_block")
        m[f"deconv1{mod}"] = (f"Conv_{cv}", "plain_conv")
        db, cv = db + 2, cv + 1
    return m


def import_scnet(sd, output_type="rgbdnsf", template=None, batchnorm=True):
    """Full state-dict map for the completion U-Net.

    Produces params for ``models.scnet.SCNet(output_type=...)``.  SCNet's
    BNs are track_running_stats=False (mymodel.py:19,32) so no folding —
    batch statistics at train AND eval, matching our BatchNorm2d default.
    """
    p = {}
    for tname, (fname, kind) in scnet_name_map(output_type).items():
        if kind == "plain_conv":
            p[fname] = _plain_conv(sd, tname)
            continue
        # Sequential block: .0 = conv, .1 = BN (if batchnorm)
        w = sd[f"{tname}.0.weight"]
        kernel = convert_deconv(w) if kind == "deconv_block" \
            else convert_conv(w)
        sub = {}
        if kind == "deconv_block":
            sub["kernel"] = kernel
        else:
            sub["Conv_0"] = {"kernel": kernel}
        if batchnorm:
            sub["BatchNorm2d_0"] = _bn_from(sd, f"{tname}.1")
        else:
            bias = np.asarray(sd[f"{tname}.0.bias"], np.float32)
            if kind == "deconv_block":
                sub["bias"] = bias
            else:
                sub["Conv_0"]["bias"] = bias
        p[fname] = sub
    _check_template(p, template)
    return p


# Backwards-compatible helpers (per-layer converters) -----------------------

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
