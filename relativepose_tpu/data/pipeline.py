"""Device-side training-data pipeline: dense correspondences + reprojection.

The reference computes these per sample on host CPU inside DataLoader
workers (datasets/SUNCG.py:315-461: sklearn KDTree for dense GT
correspondences; numpy splatting for the pose-perturbed cross-view
reprojection).  Here both are batched XLA ops so the whole training step —
augmentation included — runs on TPU from raw pano tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from relativepose_tpu import config
from relativepose_tpu.core import rotation, skybox, warp
from relativepose_tpu.core.overlap import nn_sq_dists
from relativepose_tpu.core.rotation import inverse_se3

H, W = config.PANO_HEIGHT, config.PANO_WIDTH
N_QUERY = 5000       # datasets/SUNCG.py:324
N_CORRES = 2000      # datasets/SUNCG.py:334
MIN_CORRES = 500     # datasets/SUNCG.py:329
CORR_THRESH = 0.08   # datasets/SUNCG.py:328

# Per-dataset denseCorres protocol.  SUNCG queries uniformly over the full
# pano grid (SUNCG.py:97-110 lifts every pixel, :324 samples among all);
# Matterport/ScanNet lift only nonzero-depth pixels (the "masked pano pc",
# Matterport3D.py:252 / ScanNet.py:69-91) so queries come from valid points
# only.  ScanNet keeps 500 correspondences and needs >= 200 matches
# (ScanNet.py:282-291); the others keep 2000 and need >= 500
# (SUNCG.py:329-341, Matterport3D.py:271-281).
CORRES_PARAMS = {
    "suncg": dict(n_query=N_QUERY, n_corres=N_CORRES,
                  min_corres=MIN_CORRES, masked_queries=False),
    "matterport": dict(n_query=N_QUERY, n_corres=N_CORRES,
                       min_corres=MIN_CORRES, masked_queries=True),
    "scannet": dict(n_query=N_QUERY, n_corres=500, min_corres=200,
                    masked_queries=True),
}


def dense_correspondences(depth_s, depth_t, pose_s, pose_t, key,
                          dataset: str, n_query: int | None = None,
                          n_corres: int | None = None,
                          min_corres: int | None = None,
                          masked_queries: bool | None = None):
    """GT dense correspondences between two panos (SUNCG.py:315-341,
    ScanNet.py:263-291, Matterport3D.py:250-281).

    depth_*: [H, W]; pose_*: [4, 4] world->camera.  Lifts both panos,
    moves them to the world frame, finds NNs of `n_query` random source
    points within 0.08 m (brute-force matmul instead of a KDTree), and
    samples `n_corres` of them.  Unspecified protocol parameters default
    to the dataset's row in `CORRES_PARAMS`.

    Returns dict(idx_src [n_corres, 2], idx_tgt [n_corres, 2], valid []):
    pano (x, y) coords; `valid` is 0 when fewer than `min_corres` matches
    exist, mirroring the reference's all-or-nothing contract.
    """
    defaults = CORRES_PARAMS[config.canonical_dataset(dataset)]
    n_query = defaults["n_query"] if n_query is None else n_query
    n_corres = defaults["n_corres"] if n_corres is None else n_corres
    min_corres = (defaults["min_corres"] if min_corres is None
                  else min_corres)
    masked_queries = (defaults["masked_queries"] if masked_queries is None
                      else masked_queries)

    k1, k2 = jax.random.split(key)
    pc_s, val_s = skybox.pano_to_pointcloud(depth_s, dataset)
    pc_t, val_t = skybox.pano_to_pointcloud(depth_t, dataset)
    Rs_inv = inverse_se3(pose_s)
    Rt_inv = inverse_se3(pose_t)
    pc_s = pc_s @ Rs_inv[:3, :3].T + Rs_inv[:3, 3]
    pc_t = pc_t @ Rt_inv[:3, :3].T + Rt_inv[:3, 3]

    n_pts = pc_s.shape[0]
    if masked_queries:
        # sample queries from the masked (nonzero-depth) point cloud only
        pq = val_s.astype(jnp.float32) + 1e-9
        q_idx = jax.random.choice(k1, n_pts, (n_query,), replace=True,
                                  p=pq / pq.sum())
    else:
        q_idx = jax.random.randint(k1, (n_query,), 0, n_pts)
    q = pc_s[q_idx]
    q_valid = val_s[q_idx]

    # nearest target point (index + distance) via chunked matmul
    def nn_with_idx(query, ref, rvalid, chunk=1000):
        ref_sq = jnp.sum(ref * ref, -1)
        pen = jnp.where(rvalid, 0.0, 1e30)

        def body(_, qc):
            d2 = (jnp.sum(qc * qc, -1, keepdims=True)
                  - 2.0 * jnp.einsum("ni,mi->nm", qc, ref,
                                     precision=jax.lax.Precision.HIGHEST)
                  + ref_sq[None] + pen[None])
            return None, (jnp.min(d2, -1), jnp.argmin(d2, -1))

        qr = query.reshape(-1, chunk, 3)
        _, (d2, idx) = jax.lax.scan(body, None, qr)
        return d2.reshape(-1), idx.reshape(-1)

    d2, nn_idx = nn_with_idx(q, pc_t, val_t)
    has_corres = (d2 < CORR_THRESH**2) & q_valid
    n_match = jnp.sum(has_corres)

    # sample n_corres among matches (uniform over matches, fixed shape)
    p = has_corres.astype(jnp.float32) + 1e-9
    sel = jax.random.choice(k2, n_query, (n_corres,), replace=True,
                            p=p / p.sum())
    idx_src = skybox.pano_idx(q_idx[sel])
    idx_tgt = skybox.pano_idx(nn_idx[sel])
    return {
        "idx_src": idx_src,
        "idx_tgt": idx_tgt,
        "valid": (n_match >= min_corres).astype(jnp.int32),
    }


def reproj_augment(view8_src, pose_src, pose_tgt, key, dataset: str,
                   epsilon: float = 0.1, t_sigma: float = 0.1):
    """Pose-perturbed cross-view reprojection (SUNCG.py:343-461).

    Warps `view8_src`'s observed region into the tgt frame under the GT
    relative pose perturbed by randomRotation(0.1) + N(0, 0.1) translation
    noise.  Returns dict(view8 [H, W, 8] warped rgb/n/d/mask, box [H, W]
    envelope weight, dr [4, 4] = R_true @ inv(R_perturbed) — the residual
    the completion net must tolerate).
    """
    k1, k2 = jax.random.split(key)
    T_true = pose_tgt @ inverse_se3(pose_src)
    dR = rotation.random_rotation(k1, epsilon)
    T_pert = T_true.at[:3, :3].set(dR @ T_true[:3, :3])
    T_pert = T_pert.at[:3, 3].add(jax.random.normal(k2, (3,)) * t_sigma)
    warped = warp.warp_view(view8_src, T_pert, dataset)
    dr = T_true @ inverse_se3(T_pert)

    # envelope box of the splat (SUNCG.py:436-458)
    d = warped[..., 6]
    cols = jnp.any(d != 0, axis=0)
    rows = jnp.any(d != 0, axis=1)
    any_pix = jnp.any(cols)
    ci = jnp.arange(W)
    ri = jnp.arange(H)
    c0 = jnp.min(jnp.where(cols, ci, W))
    c1 = jnp.max(jnp.where(cols, ci, -1))
    r0 = jnp.min(jnp.where(rows, ri, H))
    r1 = jnp.max(jnp.where(rows, ri, -1))
    c0 = jnp.where(any_pix, c0, 0)
    r0 = jnp.where(any_pix, r0, 0)
    c1 = jnp.where(any_pix, c1, W - 1)
    r1 = jnp.where(any_pix, r1, H - 1)
    # half-open box [r0, r1) x [c0, c1) like the reference's slice
    box = ((ri[:, None] >= r0) & (ri[:, None] < r1)
           & (ci[None, :] >= c0) & (ci[None, :] < c1)).astype(d.dtype)
    return {"view8": warped, "box": box, "dr": dr}


def assemble_pair_batch(rgb, norm, depth, poses, segm, key, dataset: str,
                        feature_learning: bool = True):
    """Full device-side sample prep for one pano pair.

    rgb: [2, H, W, 3] in [0,1]; norm: [2, H, W, 3]; depth: [2, H, W];
    poses: [2, 4, 4]; segm: [2, H, W] int.  Returns the dict of training
    tensors the completion/feature steps consume (the reference's
    Dataset.__getitem__ contract, device-resident).
    """
    k_dc, k_r0, k_r1 = jax.random.split(key, 3)
    data_mask = (depth != 0).astype(rgb.dtype)[..., None]
    out = {
        "rgb": rgb, "norm": norm, "depth": depth, "segm": segm,
        "dataMask": data_mask, "pose": poses,
    }
    view8 = jnp.concatenate(
        [rgb, norm, depth[..., None], data_mask], axis=-1)
    # t->s warp goes into view 0's frame, s->t into view 1's
    r_t2s = reproj_augment(view8[1], poses[1], poses[0], k_r0, dataset)
    r_s2t = reproj_augment(view8[0], poses[0], poses[1], k_r1, dataset)
    out["proj_view8"] = jnp.stack([r_t2s["view8"], r_s2t["view8"]])
    out["proj_box"] = jnp.stack([r_t2s["box"], r_s2t["box"]])
    out["proj_dr"] = jnp.stack([r_t2s["dr"], r_s2t["dr"]])
    if feature_learning:
        out["denseCorres"] = dense_correspondences(
            depth[0], depth[1], poses[0], poses[1], k_dc, dataset)
    return out
