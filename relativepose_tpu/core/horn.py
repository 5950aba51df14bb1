"""Horn'87 closed-form rigid alignment, batched on device.

Re-implements the semantics of the reference's `horn87_np` / `horn87_np_v2`
(rpmodule.py:17-58, util.py:289-331): given weighted correspondences, build
the 4x4 N-matrix from the cross-covariance M = src @ (w * tgt)^T, take its
dominant eigenvector as a unit quaternion, and convert to a rotation.  The
weights multiply the *target* points only, exactly as in the reference
(rpmodule.py:39-42).

The LAPACK `eig` is replaced with a batched Jacobi 4x4 eigensolver
(`relativepose_tpu.ops.eig4x4`), so the whole solve is jittable/vmappable.
"""

from __future__ import annotations

import jax.numpy as jnp

from relativepose_tpu.core.quaternion import quaternion_to_rot
from relativepose_tpu.ops.eig4x4 import max_eigvec4x4
import jax

_HP = jax.lax.Precision.HIGHEST

_EPS = 1e-12


def n_matrix(M):
    """Horn's 4x4 N-matrix from a 3x3 cross-covariance M [..., 3, 3].

    Same element layout as rpmodule.py:46-49.
    """
    m = lambda i, j: M[..., i, j]
    row0 = jnp.stack(
        [m(0, 0) + m(1, 1) + m(2, 2), m(1, 2) - m(2, 1),
         m(2, 0) - m(0, 2), m(0, 1) - m(1, 0)], axis=-1)
    row1 = jnp.stack(
        [m(1, 2) - m(2, 1), m(0, 0) - m(1, 1) - m(2, 2),
         m(0, 1) + m(1, 0), m(0, 2) + m(2, 0)], axis=-1)
    row2 = jnp.stack(
        [m(2, 0) - m(0, 2), m(0, 1) + m(1, 0),
         m(1, 1) - m(0, 0) - m(2, 2), m(1, 2) + m(2, 1)], axis=-1)
    row3 = jnp.stack(
        [m(0, 1) - m(1, 0), m(2, 0) + m(0, 2),
         m(1, 2) + m(2, 1), m(2, 2) - m(0, 0) - m(1, 1)], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def horn87(src, tgt, weight=None):
    """Weighted Horn'87 rotation. src, tgt: [..., N, 3]; weight: [..., N].

    Returns R [..., 3, 3] such that R @ src ~ tgt (in the weighted
    least-squares sense).  Matches rpmodule.py:17-58 — weights scale the
    target points before forming M = src^T-side cross covariance.
    """
    if weight is not None:
        tgt = tgt * weight[..., None]
    M = jnp.einsum("...ni,...nj->...ij", src, tgt, precision=_HP)
    q = max_eigvec4x4(n_matrix(M))
    return quaternion_to_rot(q)


def weighted_centroid(pts, w):
    """Weighted mean of pts [..., N, 3] with weights w [..., N]."""
    s = jnp.sum(w[..., None] * pts, axis=-2)
    return s / (jnp.sum(w, axis=-1, keepdims=True) + _EPS)


def fit_rigid(src_pts, tgt_pts, src_nrm, tgt_nrm, w_pos, w_nrm, mu):
    """One weighted Horn solve over positions + normals.

    Equivalent to the core of `fit_horn87` (rpmodule.py:60-84) in the
    per-correspondence factorized form: positions are centered with the
    position weights, stacked with the normals, and solved with weights
    [w_pos * mu ; w_nrm].  Returns (R [...,3,3], t [...,3]).

    src_pts/tgt_pts: [..., N, 3]; src_nrm/tgt_nrm: [..., N, 3];
    w_pos/w_nrm: [..., N]; mu: scalar.
    """
    mu_w = w_pos * mu
    sp_mean = weighted_centroid(src_pts, mu_w)
    tp_mean = weighted_centroid(tgt_pts, mu_w)
    src_c = src_pts - sp_mean[..., None, :]
    tgt_c = tgt_pts - tp_mean[..., None, :]
    all_s = jnp.concatenate([src_c, src_nrm], axis=-2)
    all_t = jnp.concatenate([tgt_c, tgt_nrm], axis=-2)
    all_w = jnp.concatenate([mu_w, w_nrm], axis=-1)
    R = horn87(all_s, all_t, all_w)
    t = tp_mean - jnp.einsum("...ij,...j->...i", R, sp_mean, precision=_HP)
    return R, t
