"""Descriptor-quality evaluation: ranking-ratio curves.

Re-implements the reference's learned-descriptor evaluation
(mainFeatureLearning.py:293-375 / mainPanoCompletion2view.py:383-414,
`evalDLDescriptor`): for each GT correspondence, the fraction of target
locations whose descriptor is CLOSER to the source descriptor than the
true match is ("ranking ratio" — 0 is perfect).  Split by whether the
correspondence endpoints are inside the observed region, exactly like the
reference's obs/unobs buckets (`denseCorres['observe']`).

Batched, jittable; also provides a classical-descriptor comparison hook.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST


def ranking_ratio(feat_s, feat_t, idx_src, idx_tgt, valid, sample=100,
                  key=None):
    """feat_s/feat_t: [n, H, W, C]; idx_src/idx_tgt: [n, K, 2] (x, y);
    valid: [n].  Returns ratios [n, S] in [0, 1] and a validity mask.

    Mirrors mainPanoCompletion2view.py:400-406: for S sampled
    correspondences, ratio = #{locations with d(f_s, f_t[loc]) <
    d(f_s, f_t[match])} / (H*W).
    """
    n, h, w, c = feat_t.shape
    k = idx_src.shape[1]
    if key is None:
        key = jax.random.PRNGKey(0)
    sel = jax.random.randint(key, (n, sample), 0, k)

    def gather(feat, idx):
        b = jnp.arange(n)[:, None]
        return feat[b, idx[..., 1].astype(jnp.int32),
                    idx[..., 0].astype(jnp.int32)]

    take = lambda idx: jnp.take_along_axis(
        idx, sel[..., None].repeat(2, -1), axis=1)
    fs = gather(feat_s, take(idx_src))  # [n, S, C]
    ft = gather(feat_t, take(idx_tgt))
    true_d2 = jnp.sum((fs - ft) ** 2, -1)  # [n, S]
    flat_t = feat_t.reshape(n, h * w, c)
    d2_all = (
        jnp.sum(fs * fs, -1, keepdims=True)
        - 2.0 * jnp.einsum("nsc,npc->nsp", fs, flat_t, precision=_HP)
        + jnp.sum(flat_t * flat_t, -1)[:, None, :]
    )
    ratios = jnp.mean(d2_all < true_d2[..., None], axis=-1)
    return ratios, valid


def sift_ranking_ratio(rgb_s, rgb_t, idx_src, idx_tgt, valid, sample=100,
                       step_size=5, seed=0):
    """Classical-SIFT ranking ratios (mainFeatureLearning.py:293-321).

    Host-side cv2: for each valid pair, sample `sample` GT correspondences,
    compute SIFT descriptors (keypoint size = step_size) at the source and
    target points and on a dense step_size-pixel grid over the target;
    ratio = fraction of grid locations whose descriptor is closer to the
    source descriptor than the true match's.  This is the comparison curve
    the reference plots against the learned descriptors.

    rgb_s/rgb_t: [n, H, W, 3] BGR in [0, 1] (numpy); idx_*: [n, K, 2]
    (x, y); valid: [n].  Returns a list of per-pair mean ratios.
    """
    import cv2
    import numpy as np

    sift = cv2.SIFT_create(contrastThreshold=0.02)  # rputil.py:152
    rng = np.random.RandomState(seed)
    n, h, w = rgb_s.shape[0], rgb_s.shape[1], rgb_s.shape[2]
    grid_kp = [cv2.KeyPoint(float(x), float(y), step_size)
               for y in range(0, h, step_size)
               for x in range(0, w, step_size)]
    ratios = []
    for j in range(n):
        if not bool(valid[j]):
            continue
        sel = rng.choice(idx_src.shape[1], sample)
        gray_s = cv2.cvtColor(
            (np.asarray(rgb_s[j]) * 255).astype(np.uint8),
            cv2.COLOR_BGR2GRAY)
        gray_t = cv2.cvtColor(
            (np.asarray(rgb_t[j]) * 255).astype(np.uint8),
            cv2.COLOR_BGR2GRAY)
        kp_s = [cv2.KeyPoint(float(c[0]), float(c[1]), step_size)
                for c in np.asarray(idx_src[j])[sel]]
        kp_t = [cv2.KeyPoint(float(c[0]), float(c[1]), step_size)
                for c in np.asarray(idx_tgt[j])[sel]]
        # cv2 SIFT.compute FILTERS keypoints (e.g. runByImageBorder), so
        # the returned rows can be a subset — keep only correspondence
        # indices whose keypoints survived in BOTH views, matched by
        # coordinates (ADVICE r4: mismatched rows silently mispair)
        kp_s_out, d_s = sift.compute(gray_s, kp_s)
        kp_t_out, d_t = sift.compute(gray_t, kp_t)

        def surviving(kp_in, kp_out):
            pos = {(round(k.pt[0], 2), round(k.pt[1], 2)): i
                   for i, k in enumerate(kp_out)}
            return {j_in: pos[key] for j_in, k in enumerate(kp_in)
                    if (key := (round(k.pt[0], 2), round(k.pt[1], 2)))
                    in pos}
        live_s = surviving(kp_s, kp_s_out or [])
        live_t = surviving(kp_t, kp_t_out or [])
        both = sorted(set(live_s) & set(live_t))
        if not both:
            continue
        d_s = d_s[[live_s[i] for i in both]]
        d_t = d_t[[live_t[i] for i in both]]
        _, d_grid = sift.compute(gray_t, list(grid_kp))
        true_d2 = np.power(d_s - d_t, 2).sum(1)
        rest = np.power(d_s[:, None, :] - d_grid[None, :, :], 2).sum(2)
        ratio = (rest < true_d2[:, None]).sum(1) / rest.shape[1]
        ratios.append(float(ratio.mean()))
    return ratios


def observe_type(mask, idx_src, idx_tgt):
    """Correspondence observation class (mainFeatureLearning.py:427-433):
    2 = both endpoints observed, 1 = one, 0 = none.  mask: [n, H, W]."""
    def at(idx):
        b = jnp.arange(mask.shape[0])[:, None]
        return mask[b, idx[..., 1].astype(jnp.int32),
                    idx[..., 0].astype(jnp.int32)]

    return at(idx_src) + at(idx_tgt)


def bucketed_ratios(feat_s, feat_t, dense, mask, key=None, sample=100):
    """Ranking ratios split into observed / unobserved buckets.

    Returns dict(obs=[...], unobs=[...]) of per-correspondence ratios for
    valid samples (host numpy lists)."""
    import numpy as np

    ratios, valid = ranking_ratio(
        feat_s, feat_t, dense["idx_src"], dense["idx_tgt"], dense["valid"],
        sample=sample, key=key)
    if key is None:
        key = jax.random.PRNGKey(0)
    n, k = dense["idx_src"].shape[:2]
    sel = jax.random.randint(key, (n, sample), 0, k)
    take = lambda idx: jnp.take_along_axis(
        idx, sel[..., None].repeat(2, -1), axis=1)
    obs = observe_type(mask, take(dense["idx_src"]), take(dense["idx_tgt"]))
    ratios = np.asarray(ratios)
    obs = np.asarray(obs)
    valid = np.asarray(dense["valid"]).astype(bool)
    out = {"obs": [], "unobs": []}
    for i in range(n):
        if not valid[i]:
            continue
        out["obs"].extend(ratios[i][obs[i] == 2].tolist())
        out["unobs"].extend(ratios[i][obs[i] < 2].tolist())
    return out
