"""Point-cloud overlap statistics on device.

Re-implements `point_cloud_overlap` (util.py:21-40): bidirectional nearest
neighbours at a 0.08 m threshold.  The reference uses sklearn KDTree on
host; on TPU a chunked brute-force min-distance (a few small matmuls on the
MXU) is faster than building any tree, and batches over pairs.

All functions take fixed-shape point arrays with validity masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST

_BIG = 1e30


def nn_sq_dists(query, qvalid, ref, rvalid, chunk: int = 2048):
    """Min squared distance from each query point to the valid ref points.

    query: [N, 3]; ref: [M, 3]; masks bool.  Returns [N] (invalid queries
    get _BIG).
    """
    n = query.shape[0]
    pad = (-n) % chunk
    q = jnp.pad(query, ((0, pad), (0, 0)))
    qv = jnp.pad(qvalid, (0, pad))
    q = q.reshape(-1, chunk, 3)
    qv = qv.reshape(-1, chunk)
    ref_sq = jnp.sum(ref * ref, axis=-1)
    ref_pen = jnp.where(rvalid, 0.0, _BIG)

    def body(carry, inp):
        qc, qvc = inp
        d2 = (
            jnp.sum(qc * qc, axis=-1, keepdims=True)
            - 2.0 * jnp.einsum("ni,mi->nm", qc, ref, precision=_HP)
            + ref_sq[None, :]
            + ref_pen[None, :]
        )
        mind = jnp.min(d2, axis=-1)
        mind = jnp.where(qvc, jnp.maximum(mind, 0.0), _BIG)
        return carry, mind

    _, out = jax.lax.scan(body, None, (q, qv))
    return out.reshape(-1)[:n]


def point_cloud_overlap(pc_src, src_valid, pc_tgt, tgt_valid, T_gt,
                        threshold: float = 0.08):
    """Overlap statistics between two scans under the GT relative pose.

    Mirrors util.py:21-40.  pc_src/pc_tgt: [N, 3]/[M, 3] with validity
    masks; T_gt: [4, 4] mapping src into tgt frame.  Returns a dict with
    overlap (max of the two directional ratios), cam_dist (||t_gt||),
    pc_dist (distance between cloud means after alignment), and pc_nn
    (mean of the two min NN distances).
    """
    R, t = T_gt[:3, :3], T_gt[:3, 3]
    src_in_tgt = jnp.einsum("ni,ji->nj", pc_src, R, precision=_HP) + t
    d2_s2t = nn_sq_dists(src_in_tgt, src_valid, pc_tgt, tgt_valid)
    n_src = jnp.maximum(jnp.sum(src_valid), 1)
    overlap_s2t = jnp.sum((d2_s2t < threshold**2) & src_valid) / n_src
    nns2t = jnp.sqrt(jnp.min(jnp.where(src_valid, d2_s2t, _BIG)))

    Rinv = R.T
    tgt_in_src = jnp.einsum("ni,ji->nj", pc_tgt - t, Rinv, precision=_HP)
    d2_t2s = nn_sq_dists(tgt_in_src, tgt_valid, pc_src, src_valid)
    n_tgt = jnp.maximum(jnp.sum(tgt_valid), 1)
    overlap_t2s = jnp.sum((d2_t2s < threshold**2) & tgt_valid) / n_tgt
    nnt2s = jnp.sqrt(jnp.min(jnp.where(tgt_valid, d2_t2s, _BIG)))

    w_src = src_valid.astype(pc_src.dtype)
    w_tgt = tgt_valid.astype(pc_tgt.dtype)
    mean_src = jnp.sum(src_in_tgt * w_src[:, None], 0) / jnp.maximum(
        jnp.sum(w_src), 1.0)
    mean_tgt = jnp.sum(pc_tgt * w_tgt[:, None], 0) / jnp.maximum(
        jnp.sum(w_tgt), 1.0)
    return {
        "overlap": jnp.maximum(overlap_s2t, overlap_t2s),
        "cam_dist": jnp.linalg.norm(t),
        "pc_dist": jnp.linalg.norm(mean_src - mean_tgt),
        "pc_nn": 0.5 * (nns2t + nnt2s),
    }
