"""Dense projective point-to-plane ICP polish for the estimated pose.

Beyond-reference pose refinement (docs/TRANSLATION.md).  The solver's
translation inherits the mean position error of ~C=1720 keypoint
correspondences — completed-depth noise at hallucinated lifts plus
pixel-level match localization error (hybrid-oracle triage,
tools/hybrid_diag.py).  Rotation is stabilized by normals; translation
is not.  This module polishes the solver pose against the DENSE
composited panos (observed pixels carry ground-truth geometry,
hallucinated pixels the completed geometry): ~100k point-to-plane
constraints instead of 1720 votes, with projective (gather-based)
association — no nearest-neighbor search, no data-dependent shapes,
a fixed `iters`-step Gauss-Newton loop that XLA compiles to dense
VPU/MXU work.

The reference has no counterpart (its closest analogue is the host
Open3D colored-ICP baseline, baselines.py:110-168, which is a
standalone method rather than a polish).  Flag-gated: default off,
reference semantics unchanged.

Geometry conventions match core/skybox.py: panos are [FACE, 4*FACE]
skybox images, points live in each view's camera-0 frame, T maps the
source view frame into the target view frame (rpmodule.py:60-84).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from relativepose_tpu import config
from relativepose_tpu.core import skybox

FACE = skybox.FACE
_HP = jax.lax.Precision.HIGHEST


def pano_points_image(depth, dataset: str):
    """Lift a pano depth map to per-pixel points in IMAGE layout.

    depth: [FACE, 4*FACE] -> (points [FACE, 4*FACE, 3], valid
    [FACE, 4*FACE]).  Same lift as skybox.pano_to_pointcloud (which
    returns face-major flat order); this keeps the row-major image
    layout so flat indices line up with the projective gather below.
    """
    pts, valid = skybox.pano_to_pointcloud(depth, dataset)
    h = FACE
    pts = pts.reshape(4, h, h, 3).transpose(1, 0, 2, 3).reshape(h, 4 * h, 3)
    valid = valid.reshape(4, h, h).transpose(1, 0, 2).reshape(h, 4 * h)
    return pts, valid


def project_to_pano(points, valid, dataset: str):
    """Project points in a view's camera-0 frame onto its pano grid.

    Nearest-pixel projective association (the gather dual of
    skybox.splat_to_pano's scatter, same face-partition logic).
    points: [N, 3] -> (flat row-major pixel index [N] int32, ok [N]).
    Invalid / off-pano points get index 0 with ok=False.
    """
    ds = config.canonical_dataset(dataset)
    order = config.FACE_ORDER[ds]
    h = FACE
    px, py, pz = points[..., 0], points[..., 1], points[..., 2]
    comps = (px, py, pz)
    any_ok = jnp.zeros(valid.shape, bool)
    block = jnp.zeros(valid.shape, jnp.int32)
    zero = jnp.zeros_like(px)
    lxs, lys, lzs = zero, zero, zero
    for f in range(4):
        R = config.FACE_ROTATIONS[order[f]]
        lx = skybox._rot_component(R, 0, comps)
        ly = skybox._rot_component(R, 1, comps)
        lz = skybox._rot_component(R, 2, comps)
        lim = 1e-32 - lz
        ok = valid & (lz < 0) & (jnp.abs(lx) < lim) & (jnp.abs(ly) < lim)
        take = ok & ~any_ok
        block = jnp.where(take, f, block)
        lxs = jnp.where(take, lx, lxs)
        lys = jnp.where(take, ly, lys)
        lzs = jnp.where(take, lz, lzs)
        any_ok = any_ok | ok
    denom = jnp.abs(lzs) + 1e-32
    xs = lxs / denom
    ys = lys / denom
    u = jnp.clip(jnp.round((xs + 1.0) * 0.5 * h), 0, h - 1).astype(jnp.int32)
    v = jnp.clip(jnp.round((1.0 - ys) * 0.5 * h), 0, h - 1).astype(jnp.int32)
    u = u + block * h
    flat = jnp.where(any_ok, v * (4 * h) + u, 0)
    return flat, any_ok


def icp_polish(T, dep_s, nrm_s, dep_t, nrm_t, dataset: str,
               iters: int = 5, sigma: float = 0.10,
               max_residual: float = 0.5, dof: int = 6,
               max_rot_step: float = 0.15, max_trans_step: float = 0.5,
               obs_s=None, obs_t=None, halluc_weight: float = 0.05,
               anchor: float = 0.03):
    """Polish T (source->target view frame) with projective ICP.

    dep_*: [FACE, 4*FACE] composited depth; nrm_*: [FACE, 4*FACE, 3]
    composited normals (in the same view frame as the lifted points).
    `dof=6` solves the full twist; `dof=3` keeps the solver rotation
    FIXED and refines translation only (the conservative setting for
    low-overlap pairs where completed rotation is already near-oracle).
    Geman-McClure weights with scale `sigma` (meters); associations with
    |point-to-plane residual| > max_residual are dropped.  Every
    iteration is guarded: non-finite or over-sized steps leave T
    unchanged, so the polish can only be a no-op, never a blow-up.

    obs_s/obs_t: optional [FACE, 4*FACE] observed-region masks.  The
    composited pano is ground-truth geometry where observed and
    completed geometry elsewhere; hallucinated pixels are the large
    majority (75-93% of the pano) and their depth bias drags the dense
    solution if they vote at full weight (the first on-device A/B of
    this polish LOST mid/high-overlap translation for exactly that
    reason — docs/TRANSLATION.md).  With masks given, each
    association's weight is scaled by obs(+halluc_weight fallback) on
    BOTH endpoints, so observed-observed constraints dominate wherever
    they exist and hallucinated geometry only carries the solve where
    nothing better is available (the 0-0.1-overlap regime).

    `anchor` adds a Tikhonov prior pulling each Gauss-Newton solve back
    toward the INITIAL pose (the solver estimate).  Point-to-plane
    systems go rank-deficient when the supporting geometry is nearly
    planar (a mid-overlap strip of one wall constrains only the
    normal direction): without the anchor the solution drifts along
    the null directions toward whatever the down-weighted hallucinated
    geometry prefers, and the second on-device A/B lost mid-overlap
    translation exactly that way.  Directions the dense geometry
    constrains (normalized-A eigenvalues O(1)) override the anchor;
    unconstrained directions stay at the solver answer.
    """
    P_s, v_s = pano_points_image(dep_s, dataset)
    P_t, v_t = pano_points_image(dep_t, dataset)
    p_s = P_s.reshape(-1, 3)
    valid_s = v_s.reshape(-1)
    p_t_flat = P_t.reshape(-1, 3)
    v_t_flat = v_t.reshape(-1)
    n_t_flat = nrm_t.reshape(-1, 3)
    s2 = sigma * sigma
    if obs_s is not None:
        ow_s = obs_s.reshape(-1) + halluc_weight * (1.0 - obs_s.reshape(-1))
    else:
        ow_s = jnp.ones_like(valid_s, dtype=p_s.dtype)
    if obs_t is not None:
        ow_t = obs_t.reshape(-1) + halluc_weight * (1.0 - obs_t.reshape(-1))
    else:
        ow_t = jnp.ones(v_t_flat.shape, dtype=p_s.dtype)

    def gn_step(T, T0):
        R, t = T[:3, :3], T[:3, 3]
        q = p_s @ R.T + t                         # [N, 3] in target frame
        idx, ok = project_to_pano(q, valid_s, dataset)
        pt = p_t_flat[idx]
        nt = n_t_flat[idx]
        r = jnp.sum(nt * (q - pt), axis=-1)       # point-to-plane residual
        good = ok & v_t_flat[idx] & (jnp.abs(r) < max_residual)
        w = good.astype(q.dtype) * (s2 / (s2 + r * r)) * ow_s * ow_t[idx]
        if dof == 6:
            jac = jnp.concatenate([jnp.cross(q, nt), nt], axis=-1)  # [N,6]
        else:
            jac = nt                                                 # [N,3]
        a = jnp.einsum("ni,nj->ij", jac * w[:, None], jac, precision=_HP)
        b = -jnp.einsum("ni,n->i", jac, w * r, precision=_HP)
        wsum = jnp.sum(w) + 1e-12
        # first-order twist pulling the current pose back to T0
        R_rel = T0[:3, :3] @ R.T
        w_err = 0.5 * jnp.stack([R_rel[2, 1] - R_rel[1, 2],
                                 R_rel[0, 2] - R_rel[2, 0],
                                 R_rel[1, 0] - R_rel[0, 1]])
        t_err = T0[:3, 3] - t
        if dof == 6:
            prior = jnp.concatenate([w_err, t_err])
        else:
            prior = t_err
        k = jac.shape[-1]
        a = a / wsum + (anchor + 1e-6) * jnp.eye(k, dtype=q.dtype)
        delta = jnp.linalg.solve(a, b / wsum + anchor * prior)
        if dof == 6:
            omega, nu = delta[:3], delta[3:]
        else:
            omega, nu = jnp.zeros(3, q.dtype), delta
        return omega, nu, wsum

    def rodrigues(omega):
        theta2 = jnp.sum(omega * omega)
        theta = jnp.sqrt(theta2 + 1e-24)
        k = omega / theta
        kx = jnp.array([[0.0, -k[2], k[1]],
                        [k[2], 0.0, -k[0]],
                        [-k[1], k[0], 0.0]], dtype=omega.dtype)
        s, c = jnp.sin(theta), jnp.cos(theta)
        R = jnp.eye(3, dtype=omega.dtype) + s * kx + (1.0 - c) * (kx @ kx)
        # theta ~ 0: the series is I + [omega]x; the closed form above is
        # grad-safe thanks to the 1e-24 floor but loses precision there
        small = theta < 1e-6
        kx0 = jnp.array([[0.0, -omega[2], omega[1]],
                         [omega[2], 0.0, -omega[0]],
                         [-omega[1], omega[0], 0.0]], dtype=omega.dtype)
        return jnp.where(small, jnp.eye(3, dtype=omega.dtype) + kx0, R)

    T_init = T

    def body(_, T):
        omega, nu, wsum = gn_step(T, T_init)
        ok_step = (
            jnp.all(jnp.isfinite(omega)) & jnp.all(jnp.isfinite(nu))
            & (jnp.sqrt(jnp.sum(omega * omega)) < max_rot_step)
            & (jnp.sqrt(jnp.sum(nu * nu)) < max_trans_step)
            & (wsum > 32.0)   # require a real support set, not stragglers
        )
        Rd = rodrigues(omega)
        T2 = jnp.eye(4, dtype=T.dtype)
        T2 = T2.at[:3, :3].set(Rd @ T[:3, :3])
        T2 = T2.at[:3, 3].set(Rd @ T[:3, 3] + nu)
        return jnp.where(ok_step, T2, T)

    return jax.lax.fori_loop(0, iters, body, T)
