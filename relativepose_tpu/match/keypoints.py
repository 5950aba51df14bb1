"""Fixed-shape keypoint extraction, fully on device.

Replaces the reference's host-side OpenCV SIFT + per-point Python loops
(RPModule/rputil.py:141-371) with jittable, batched ops:

  * `detect_dog`: a multi-scale difference-of-Gaussians detector with 3x3
    NMS and top-K selection.  Keypoint *parity* with OpenCV SIFT is not
    required — the reference's keypoint sets are stochastic (np.random.seed()
    per pair, evaluation.py:160) and only feed the descriptor-matching
    stage; what matters is producing well-spread, repeatable corners in the
    observed region.
  * `augment_with_feature_matches`: the reference's `Sampling` augmentation
    (rputil.py:184-219): take N selected keypoints from one view, find the
    top-2 locations in the other view's descriptor map (with 15-px NMS
    windows), and add those as candidate keypoints of the other view.
  * `random_unobserved_points`: the 30 (120 for kinect) uniform samples
    outside the observed region (rputil.py:202-219, :313-334).
  * `build_keypoint_sets`: assembles the per-view fixed-capacity keypoint
    sets with observation weights 1.0 / 0.99 (rputil.py:229-235).

Every output is a fixed-size array + validity mask.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from relativepose_tpu import config
from relativepose_tpu.ops.interpolate import interpolate_normalized
from relativepose_tpu.ops.sampling import topk_nms

FACE = config.FACE
H, W = config.PANO_HEIGHT, config.PANO_WIDTH

N_SIFT_MATCH = 30   # rputil.py:143
N_RANDOM = 30       # rputil.py:144
N_RANDOM_KINECT = 120  # rputil.py:313
MARKER = 0.99       # rputil.py:145
AUG_TOPK = 2        # rputil.py:147


@dataclasses.dataclass(frozen=True)
class KeypointConfig:
    n_detect: int = 224       # detector capacity per view
    dog_threshold: float = 2.0  # on 0..255 luma DoG response
    n_match: int = N_SIFT_MATCH
    n_random: int = N_RANDOM

    @property
    def capacity(self) -> int:
        # detected + 2*n_match aug + max(n_random, 2*n_random aug)
        return self.n_detect + 2 * self.n_match + 2 * self.n_random


def rgb_to_gray(rgb):
    """BGR->gray luma like cv2.cvtColor(BGR2GRAY); rgb in [..., 3] BGR order
    0..255 (the reference stores panos BGR because cv2.imread loads BGR)."""
    b, g, r = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return 0.114 * b + 0.587 * g + 0.299 * r


@functools.lru_cache(maxsize=None)
def _gauss_taps(sigma: float, radius: int):
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(img, sigma, radius=None):
    """Separable gaussian blur of img [h, w] with edge-replicate padding.

    Replicate (not zero) padding matters: zero padding darkens a flat image
    near its borders, and the difference of two blurs with different radii
    then produces phantom DoG responses up to ~3*sigma pixels deep — spurious
    "keypoints" on textureless white walls.  With replicate padding a flat
    image is an exact fixed point of the blur at every scale.
    """
    radius = radius or max(1, int(3 * sigma + 0.5))
    taps = jnp.asarray(_gauss_taps(float(sigma), radius))
    padded = jnp.pad(img, ((radius, radius), (radius, radius)), mode="edge")
    x = padded[None, :, :, None]
    kh = taps.reshape(-1, 1, 1, 1)
    kw = taps.reshape(1, -1, 1, 1)
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn)
    return x[0, :, :, 0]


@functools.lru_cache(maxsize=None)
def _scale_stack_kernels(sigmas):
    """Zero-padded tap stacks for blurring all scales in ONE conv pair.

    Returns (radius, kv [2r+1, 1, 1, S], kh [1, 2r+1, 1, S]) where each
    output channel s applies sigma_s's normalized taps (shorter kernels are
    zero-padded to the shared radius, which preserves normalization).

    NOTE: returns numpy, not jnp — this function is reached from inside
    jit traces, and caching `jnp.asarray` results made under a trace
    leaks tracers into every later trace (UnexpectedTracerError)."""
    radius = max(max(1, int(3 * s + 0.5)) for s in sigmas)
    cols = []
    for s in sigmas:
        r = max(1, int(3 * s + 0.5))
        taps = np.zeros(2 * radius + 1, np.float32)
        taps[radius - r : radius + r + 1] = _gauss_taps(float(s), r)
        cols.append(taps)
    stack = np.stack(cols, -1)  # [2r+1, S]
    kv = stack.reshape(2 * radius + 1, 1, 1, len(sigmas))
    kh = stack.reshape(1, 2 * radius + 1, 1, len(sigmas))
    return radius, kv, kh


def _blur_scales(img, sigmas):
    """All-scale gaussian stack of img [h, w] -> [h, w, S] in two convs.

    Vertical pass maps the single input channel to S scale channels;
    horizontal pass is a grouped (depthwise) conv, one sigma per channel.
    Edge-replicate padding as in `_blur` (flat image = exact fixed point).
    """
    radius, kv_np, kh_np = _scale_stack_kernels(
        tuple(float(s) for s in sigmas))
    kv, kh = jnp.asarray(kv_np), jnp.asarray(kh_np)
    padded = jnp.pad(img, ((radius, radius), (radius, radius)), mode="edge")
    x = padded[None, :, :, None]
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, kv, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
        feature_group_count=len(sigmas))
    return x[0]


def detect_dog(gray, k_det: int, threshold: float = 2.0):
    """Multi-scale DoG corner detector on a grayscale image [h, w].

    Returns (pts [k_det, 2] float (x, y), valid [k_det] bool), strongest
    first.  Border pixels (1 px) are excluded so downstream bilinear reads
    stay in bounds (the reference filters x < W-1, y < H-1 similarly).
    """
    h, w = gray.shape
    sigmas = (1.0, 1.6, 2.56, 4.1)
    stack = _blur_scales(gray, sigmas)
    resp = jnp.max(jnp.abs(stack[..., 1:] - stack[..., :-1]), axis=-1)
    # 3x3 non-max suppression
    pooled = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    is_peak = (resp >= pooled) & (resp > threshold)
    border = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
    score = jnp.where(is_peak & border, resp, -1.0)
    flat_scores, flat_idx = jax.lax.top_k(score.reshape(-1), k_det)
    ys = (flat_idx // w).astype(jnp.float32)
    xs = (flat_idx % w).astype(jnp.float32)
    return jnp.stack([xs, ys], -1), flat_scores > 0


def _select_queries(desc, valid, key, n):
    """Pick n descriptors at random among the valid ones (rputil.py:184)."""
    probs = valid.astype(jnp.float32) + 1e-9  # keep a valid simplex
    probs = probs / probs.sum()
    sel = jax.random.choice(key, desc.shape[0], (n,), replace=True, p=probs)
    return desc[sel], valid[sel]


def _distance_heatmaps(q, feat):
    """Squared-distance heatmaps [n, H, W] of queries q [n, F] against a
    dense map feat [H, W, F], via one MXU matmul: |q|^2 - 2 q.f + |f|^2."""
    h, w = feat.shape[:2]
    flat = feat.reshape(-1, feat.shape[-1])
    d = (
        jnp.sum(q * q, -1, keepdims=True)
        - 2.0 * q @ flat.T
        + jnp.sum(flat * flat, -1)[None, :]
    )
    return d.reshape(q.shape[0], h, w)


def _nms_to_keypoints(d, sel_valid, hw):
    """Top-2-with-NMS locations per heatmap -> fixed-shape keypoints."""
    h, w = hw
    pts = topk_nms(d, AUG_TOPK).reshape(-1, 2).astype(jnp.float32)
    valid = (pts[:, 0] < w - 1) & (pts[:, 1] < h - 1)
    return pts, valid & jnp.repeat(sel_valid, AUG_TOPK)


def augment_with_feature_matches(desc_query, query_valid, feat_other, key,
                                 n_match: int):
    """Reference `Sampling` augmentation (rputil.py:184-198).

    desc_query: [K, F] descriptors of one view's keypoints;
    feat_other: [H, W, F] dense feature map of the OTHER view.
    Selects `n_match` query descriptors at random (among valid), builds
    distance heatmaps, and returns the top-2-with-NMS locations per query
    as keypoints of the other view: (pts [2*n_match, 2], valid).
    """
    q, sel_valid = _select_queries(desc_query, query_valid, key, n_match)
    d = _distance_heatmaps(q, feat_other)
    return _nms_to_keypoints(d, sel_valid, feat_other.shape[:2])


def in_observed_region(pts, mask_method: str):
    """Observation test used for keypoint weights (rputil.py:229-235,
    :345-351).  pts: [..., 2] (x, y) pano coords."""
    x, y = pts[..., 0], pts[..., 1]
    if mask_method == "second":
        return (x >= FACE) & (x <= 2 * FACE)
    if mask_method == "kinect":
        return (
            (x >= config.KINECT_COL0) & (x <= config.KINECT_COL1)
            & (y >= config.KINECT_ROW0) & (y <= config.KINECT_ROW1)
        )
    raise ValueError(mask_method)


def random_unobserved_points(key, n_random: int, mask_method: str):
    """Uniform pano points outside the observed region (kept fixed-shape
    with validity instead of boolean filtering)."""
    kx, ky = jax.random.split(key)
    xs = jnp.clip((jax.random.uniform(kx, (n_random,)) * W).astype(jnp.int32),
                  0, W - 2).astype(jnp.float32)
    ys = jnp.clip((jax.random.uniform(ky, (n_random,)) * H).astype(jnp.int32),
                  0, H - 2).astype(jnp.float32)
    pts = jnp.stack([xs, ys], -1)
    return pts, ~in_observed_region(pts, mask_method)


def _normalized(pts):
    return pts / jnp.asarray([W, H], dtype=pts.dtype)


def detect_observed(rgb, cfg: KeypointConfig, gray_full=None):
    """Step-invariant DoG detection on the observed region (rputil.py:152).

    Factored out of `build_keypoint_sets` so the recurrent pipeline can
    detect ONCE per view: the observed rgb (and the scannet full frame)
    never changes across recurrence steps, only the descriptor maps do.
    Returns (pts [n_detect, 2] pano coords, valid [n_detect])."""
    if gray_full is not None:
        # kinect: detect on the full frame, remap into the pano window
        pts, valid = detect_dog(gray_full, cfg.n_detect, cfg.dog_threshold)
        x = pts[:, 0] / config.KINECT_FULL_W * config.KINECT_FOV_W \
            + config.KINECT_COL0
        y = pts[:, 1] / config.KINECT_FULL_H * config.KINECT_FOV_H \
            + config.KINECT_ROW0
        return jnp.stack([x, y], -1), valid
    gray = rgb_to_gray(rgb)
    obs = gray[:, FACE : 2 * FACE]
    pts, valid = detect_dog(obs, cfg.n_detect, cfg.dog_threshold)
    return pts + jnp.asarray([FACE, 0.0]), valid


def build_keypoint_sets(rgb_s, rgb_t, feat_s, feat_t, key,
                        cfg: KeypointConfig, mask_method: str = "second",
                        gray_full_s=None, gray_full_t=None,
                        det_s=None, det_t=None):
    """Per-view keypoint sets (getKeypoint / getKeypoint_kinect,
    rputil.py:141-353).

    rgb_s/rgb_t: [H, W, 3] masked color panos (0..255, BGR);
    feat_s/feat_t: [H, W, F] descriptor maps.  For scannet pass
    gray_full_s/t [480, 640] (detection runs on the full-size frame and is
    remapped into the kinect window, rputil.py:257-279).  det_s/det_t:
    optional precomputed `detect_observed` results (pts, valid) — pass
    them when calling per recurrence step to avoid re-detecting.

    Returns (pts_s, valid_s, w_s, pts_t, valid_t, w_t) with
    pts: [capacity, 2] float pano coords, w: 1.0 observed / 0.99 outside.
    """
    # The fused augmentation below bounds ALL concatenated heatmaps with
    # feat_t's extent, which is only correct while the two views share a
    # shape — fail loudly if a dataset variant ever breaks that.
    assert feat_s.shape[:2] == feat_t.shape[:2], (
        feat_s.shape, feat_t.shape)
    keys = jax.random.split(key, 6)

    if det_s is None:
        det_s = detect_observed(rgb_s, cfg, gray_full_s)
    if det_t is None:
        det_t = detect_observed(rgb_t, cfg, gray_full_t)
    det_s, det_s_valid = det_s
    det_t, det_t_valid = det_t

    desc_s = interpolate_normalized(feat_s, _normalized(det_s))
    desc_t = interpolate_normalized(feat_t, _normalized(det_t))

    # cross-view feature-match augmentation (both directions) + the random
    # unobserved-point matches.  The three heatmap/NMS passes are fused:
    # two MXU matmuls (one per target feature map) and ONE topk_nms over
    # the concatenated [2*n_match + n_random, H, W] stack — the NMS
    # fori_loop is launch-bound, so batching all maps through it cuts the
    # augmentation stage to a third of its per-call cost.
    q_t1, q_t1_valid = _select_queries(desc_s, det_s_valid, keys[0],
                                       cfg.n_match)
    q_s, q_s_valid = _select_queries(desc_t, det_t_valid, keys[1],
                                     cfg.n_match)
    rnd_s, rnd_s_valid = random_unobserved_points(
        keys[2], cfg.n_random, mask_method)
    desc_rnd = interpolate_normalized(feat_s, _normalized(rnd_s))
    q_t2, q_t2_valid = _select_queries(desc_rnd, rnd_s_valid, keys[3],
                                       cfg.n_random)

    d_t = _distance_heatmaps(jnp.concatenate([q_t1, q_t2], 0), feat_t)
    d_s = _distance_heatmaps(q_s, feat_s)
    pts_all, valid_all = _nms_to_keypoints(
        jnp.concatenate([d_t, d_s], 0),
        jnp.concatenate([q_t1_valid, q_t2_valid, q_s_valid], 0),
        feat_t.shape[:2])
    n_t1 = AUG_TOPK * cfg.n_match
    n_t2 = AUG_TOPK * cfg.n_random
    aug_t, aug_t_valid = pts_all[:n_t1], valid_all[:n_t1]
    aug_t2, aug_t2_valid = (pts_all[n_t1:n_t1 + n_t2],
                            valid_all[n_t1:n_t1 + n_t2])
    aug_s, aug_s_valid = (pts_all[n_t1 + n_t2:], valid_all[n_t1 + n_t2:])

    def pad_to(pts, valid, n):
        pad = n - pts.shape[0]
        return (jnp.pad(pts, ((0, pad), (0, 0))),
                jnp.pad(valid, (0, pad)))

    cap = cfg.capacity
    pts_s = jnp.concatenate([det_s, aug_s, rnd_s], 0)
    valid_s = jnp.concatenate([det_s_valid, aug_s_valid, rnd_s_valid], 0)
    pts_s, valid_s = pad_to(pts_s, valid_s, cap)

    pts_t = jnp.concatenate([det_t, aug_t, aug_t2], 0)
    valid_t = jnp.concatenate([det_t_valid, aug_t_valid, aug_t2_valid], 0)
    pts_t, valid_t = pad_to(pts_t, valid_t, cap)

    w_s = jnp.where(in_observed_region(pts_s, mask_method), 1.0, MARKER)
    w_t = jnp.where(in_observed_region(pts_t, mask_method), 1.0, MARKER)
    return pts_s, valid_s, w_s, pts_t, valid_t, w_t
