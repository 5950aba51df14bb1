"""Pairwise-consistency pose solver (irls+sm / spectral / irls / horn87).

TPU-native re-design of `RelativePoseEstimation_helper` and the `fit_*`
solvers (rpmodule.py:17-508).  The reference builds an explicit list of
correspondence *pairs*, filters it with boolean indexing, and runs ARPACK
`sparse.linalg.eigs` on a (numFea_s*numFea_t)^2 consistency matrix — all
host-side, dynamic-shape, per-pair.

Key observation that makes this solver MXU-shaped: every quantity the
reference computes over correspondence *pairs* factorizes through a single
symmetric pair-weight matrix W in R^[C x C] (C = num correspondences):

  * the Horn'87 sums over the stacked pair list  Sum_pairs w[p,q](X[p]+X[q])
    reduce to per-correspondence weights  rho[c] = Sum_q W[c,q]  (a row sum);
  * the IRLS reweighting factors depend only on the correspondence, so they
    stay O(C) diagonal state;
  * the spectral consistency matrix is A[p,q] = W[p,q] * (h[p] + h[q]) with
    h[c] = max(0, offset - r[c]) a per-correspondence residual score, so its
    matvec is two dense C x C matvecs:  v -> h*(W v) + W (h*v);
  * after a spectral round the pair weights become W[p,q]*u[p]*u[q] (u the
    dominant eigenvector, elementwise >= 0), i.e. a rank-1 modulation whose
    row sums are  u * (W u).

So the whole irls+sm solve is: build W once (dense, masked), then a fixed
schedule of row-sums, 4x4 Horn eigensolves, and power-iteration matvecs —
fully batched over pairs, no dynamic shapes, no host round trips.

Dynamic-shape early-outs (return identity when fewer than 3 keypoints /
correspondences / consistent pairs survive, rpmodule.py:346-472) become
masked counts + a final `where` select.

Replicated reference semantics worth noting:
  * features are scaled by 1/100 (the infamous `FEAT_SCALING.` typo at
    rpmodule.py:342-343 is read as `/ 100.0`);
  * sigma_feat is tightened by OBS_W=1.2 when both endpoints are observed
    (rpmodule.py:356-357);
  * affinity rows are L2-normalized (rpmodule.py:359-363);
  * the separation filter compares min pair distance against
    1.5 * distSepThre^2 — squared, exactly as written (rpmodule.py:404);
  * pair weights are multiplied by 0.6 if any endpoint is unobserved
    (rpmodule.py:462-467).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from relativepose_tpu.core import horn

_HP = jax.lax.Precision.HIGHEST
_EPS = 1e-12

FEAT_SCALING = 100.0
OBS_W = 1.2
SPECTRAL_OFFSET = 50.0
RES_SIGMA = 1.0


@dataclasses.dataclass(frozen=True)
class SolverStaticConfig:
    """Shape/schedule constants (static under jit)."""

    top_k: int = 5                # rputil.py:21
    num_reweighted: int = 5       # rpmodule.py:228
    num_alter: int = 5            # rpmodule.py:229
    power_iters: int = 30         # replaces ARPACK eigs(k=1)
    method: str = "irls+sm"       # 'horn87' | 'spectral' | 'irls' | 'irls+sm'
    # Pallas VMEM-resident power iteration.  Measured on v5e at C=1720,
    # B=8: pallas 31.7 ms vs fused-XLA 25.7 ms (bit-identical results) —
    # XLA's batched [B, C, C] x [B, C, 2] matmuls pipeline better than
    # per-pair grid programs at this size, so XLA is the default.  The
    # kernel (ops/pallas_kernels.py) wins when C grows past VMEM-friendly
    # batching; flip this on to use it.
    use_pallas: bool = False
    # Optional tight-sigma Gaussian inlier refit after the method fit
    # (round-5 translation work, VERDICT r4 #4).  The reference's IRLS
    # reweighting uses resSigma=1 (meter scale, rpmodule.py:198) which
    # barely downweights sub-meter position outliers — rotation is robust
    # to them (normals dominate the N-matrix) but the translation
    # t = mu_t - R mu_s inherits their full position error.  Each refit
    # round reweights correspondences by their descriptor affinity times
    # exp(-res^2 / 2 sigma^2) under the current pose and re-solves Horn;
    # a small weight floor keeps the solve conditioned (and the backward
    # path finite) when no correspondence lands within sigma.  0 rounds =
    # reference semantics (default).
    refit_rounds: int = 0
    refit_sigma: float = 0.08     # = opts.distThre (rputil.py:13)
    # Robust translation re-aggregation (round-5 translation work,
    # VERDICT r4 #4).  The hybrid-oracle triage (tools/hybrid_diag.py,
    # ldesc_gtd/ldesc_gtn/ldesc_gtgeo combos) shows the learned
    # pipeline's translation error is dominated by per-correspondence
    # POSITION outliers: completed-depth error at lifted keypoints
    # (~half) and descriptor mismatches (the rest — even with GT
    # geometry, trans stays ~12x off the oracle while rotation is fine).
    # The reference's t = mu_t - R mu_s (rpmodule.py:60-84) is a
    # weighted MEAN over correspondences and inherits outliers' full
    # position error; rotation does not because normals dominate its
    # N-matrix.  This option keeps the fitted R FIXED and re-estimates
    # only t as a robust (Geman-McClure) IRLS mean of the
    # per-correspondence translation votes t_c = pt_c - R ps_c,
    # weighted by the descriptor-affinity weights.  Unlike the
    # refit_rounds experiment above (a negative result: re-solving R
    # with tight Gaussian weights destabilizes the rotation), this
    # cannot move R at all.  0 rounds = reference semantics (default).
    trans_refine_rounds: int = 0
    trans_refine_sigma: float = 0.10
    # Pallas fused pair-weight build.  The XLA pair_weight_matrix
    # materializes ~15 [C, C] f32 temporaries through HBM; the Pallas
    # kernel (ops/pallas_kernels.py::pair_weight_matrix_vmem) builds each
    # [256, 256] tile entirely in VMEM from [C]-sized inputs.  Applied on
    # TPU backends only (the XLA path remains the CPU/test reference).
    pallas_w_build: bool = True


@dataclasses.dataclass
class SolverHyperParams:
    """Continuous hyper-parameters (tunable, traced). rputil.py:11-22."""

    sigma_angle1: jnp.ndarray | float = 0.523 / 2
    sigma_angle2: jnp.ndarray | float = 0.523 / 2
    sigma_dist: jnp.ndarray | float = 0.08 / 2
    sigma_feat: jnp.ndarray | float = 0.01
    dist_thre: float = 0.08
    dist_sep_thre: float = 1.5 * 0.08
    angle_thre: float = 45.0 / 180.0 * 3.141592653589793
    mu: float = 0.3


jax.tree_util.register_dataclass(
    SolverHyperParams,
    data_fields=["sigma_angle1", "sigma_angle2", "sigma_dist", "sigma_feat",
                 "dist_thre", "dist_sep_thre", "angle_thre", "mu"],
    meta_fields=[],
)


# ---------------------------------------------------------------------------
# Stage 1: descriptor affinity + top-K correspondence candidates
# ---------------------------------------------------------------------------

def descriptor_affinity(feat_s, feat_t, w_s, w_t, valid_s, valid_t,
                        sigma_feat):
    """Row-normalized descriptor affinity wij (rpmodule.py:353-363).

    feat_s: [Ks, F] (already /100); w_s/w_t: [K] observation weights;
    valid: [K] bool.  Returns wij [Ks, Kt].
    """
    d_ij = jnp.sum(
        (feat_s[:, None, :] - feat_t[None, :, :]) ** 2, axis=-1
    )
    both_obs = (w_s[:, None] * w_t[None, :]) == 1.0
    sigma = jnp.where(both_obs, sigma_feat / OBS_W, sigma_feat)
    wij = jnp.exp(-d_ij / (2.0 * (sigma / 5.0) ** 2))
    wij = wij * valid_s[:, None] * valid_t[None, :]
    # gradient-safe row normalization: jnp.linalg.norm of an all-zero row
    # (fully-invalid source keypoint) has a NaN backward (0/0) that
    # poisons pose-loss fine-tuning through the solver
    # (train/finetune_pose.py); sqrt(sum^2 + eps^2) is forward-identical
    # to ~1e-12 and smooth at 0.
    nm = jnp.sqrt(jnp.sum(wij * wij, axis=1, keepdims=True) + _EPS * _EPS)
    return wij / nm


def _gather_correspondences(wij, top_k):
    """Top-K targets per source -> flat correspondence arrays.

    Returns (src_idx [C], tgt_idx [C], f [C]) with C = Ks * top_k;
    f is the affinity value of each correspondence (rpmodule.py:368-374,
    :453-454).
    """
    ks = wij.shape[0]
    f_vals, tgt_idx = jax.lax.top_k(wij, top_k)  # [Ks, top_k]
    src_idx = jnp.repeat(jnp.arange(ks), top_k)
    return src_idx, tgt_idx.reshape(-1), f_vals.reshape(-1)


# ---------------------------------------------------------------------------
# Stage 2: pairwise consistency -> symmetric weight matrix W
# ---------------------------------------------------------------------------

def pair_weight_matrix(ps, pt, ns, nt, f, obs_prod, cvalid, hp):
    """The symmetric pair-consistency weight matrix and early-out counts.

    ps/pt: [C, 3] correspondence endpoint positions; ns/nt: [C, 3] normals;
    f: [C] affinities; obs_prod: [C] product of the two endpoint observation
    weights; cvalid: [C] bool.  Implements rpmodule.py:382-467 densely.

    Returns (W [C, C] symmetric, counts dict).
    """
    # Per-component outer differences (3 x [C, C] each side) instead of
    # materialized [C, C, 3] edge tensors: every pairwise quantity below is
    # a short sum of [C, C] outer ops, which XLA keeps in one fusion.
    dd_s = [ps[:, k, None] - ps[None, :, k] for k in range(3)]
    dd_t = [pt[:, k, None] - pt[None, :, k] for k in range(3)]
    d2_s = dd_s[0] ** 2 + dd_s[1] ** 2 + dd_s[2] ** 2
    d2_t = dd_t[0] ** 2 + dd_t[1] ** 2 + dd_t[2] ** 2
    # +eps under the sqrt: d/dx sqrt(0) = inf, and the diagonal /
    # duplicate-keypoint zero distances otherwise turn the fine-tuning
    # backward pass into masked-out-times-inf = NaN
    dis_s = jnp.sqrt(d2_s + 1e-20)
    dis_t = jnp.sqrt(d2_t + 1e-20)
    d2 = (dis_s - dis_t) ** 2
    dist_ok = (d2 < hp.dist_thre**2) & (
        jnp.minimum(dis_s, dis_t) > 1.5 * hp.dist_sep_thre**2
    )

    # inverse edge lengths: dot-with-edge / |edge| == dot with unit edge
    inv_s = 1.0 / jnp.maximum(dis_s, _EPS)
    inv_t = 1.0 / jnp.maximum(dis_t, _EPS)

    def ang_diff_sq(a, b):
        """(arccos a - arccos b)^2 for a, b in [-1, 1], via
        cos(alpha - beta) = ab + sin(alpha) sin(beta): both angles are in
        [0, pi] and only the square is used, so one arccos suffices."""
        # clip strictly inside [-1, 1]: arccos'(+-1) and sqrt'(0) are
        # infinite, and parallel normals (c == 1 exactly) are the COMMON
        # case — forward changes by < arccos(1 - 1e-7)^2 ~= 2e-7
        lim = 1.0 - 1e-7
        a = jnp.clip(a, -lim, lim)
        b = jnp.clip(b, -lim, lim)
        c = a * b + jnp.sqrt((1.0 - a * a) * (1.0 - b * b) + 1e-20)
        return jnp.arccos(jnp.clip(c, -lim, lim)) ** 2

    nn_s = jnp.einsum("ci,di->cd", ns, ns, precision=_HP)
    nn_t = jnp.einsum("ci,di->cd", nt, nt, precision=_HP)
    alpha = ang_diff_sq(nn_s, nn_t)
    # beta: normal of the ROW corres vs the edge; gamma: normal of the COL
    ne1_row = (ns[:, 0, None] * dd_s[0] + ns[:, 1, None] * dd_s[1]
               + ns[:, 2, None] * dd_s[2]) * inv_s
    ne2_row = (nt[:, 0, None] * dd_t[0] + nt[:, 1, None] * dd_t[1]
               + nt[:, 2, None] * dd_t[2]) * inv_t
    beta = ang_diff_sq(ne1_row, ne2_row)
    ne1_col = (ns[None, :, 0] * dd_s[0] + ns[None, :, 1] * dd_s[1]
               + ns[None, :, 2] * dd_s[2]) * inv_s
    ne2_col = (nt[None, :, 0] * dd_t[0] + nt[None, :, 1] * dd_t[1]
               + nt[None, :, 2] * dd_t[2]) * inv_t
    gamma = ang_diff_sq(ne1_col, ne2_col)

    a2 = hp.angle_thre**2
    angle_ok = (alpha < a2) & (beta < a2) & (gamma < a2)

    w = f[:, None] * f[None, :] * jnp.exp(
        -d2 / (2.0 * hp.sigma_dist**2)
        - alpha / (2.0 * hp.sigma_angle1**2)
        - beta / (2.0 * hp.sigma_angle2**2)
        - gamma / (2.0 * hp.sigma_angle2**2)
    )
    all_obs = (obs_prod[:, None] * obs_prod[None, :]) == 1.0
    w = jnp.where(all_obs, w, w * 0.6)

    pair_valid = cvalid[:, None] & cvalid[None, :]
    upper = jnp.triu(jnp.ones_like(w, dtype=bool), k=1)

    w = w * dist_ok * angle_ok * pair_valid
    w = jnp.where(upper, w, 0.0)
    w = w + w.T  # symmetric, zero diagonal

    counts = {
        "dist": jnp.sum(dist_ok & pair_valid & upper),
        "dist_angle": jnp.sum(dist_ok & angle_ok & pair_valid & upper),
        "nonzero_w": jnp.sum((w != 0) & upper),
    }
    return w, counts


# ---------------------------------------------------------------------------
# Stage 3: solvers in factorized per-correspondence form
# ---------------------------------------------------------------------------

def _power_iteration(matvec, c, iters):
    """Dominant eigenvector of a nonneg symmetric operator, >= 0 entries."""
    v = jnp.ones((c,))

    def body(_, v):
        y = matvec(v)
        n = jnp.sqrt(jnp.sum(y * y) + _EPS * _EPS)  # grad-safe at y = 0
        return jnp.where(n > 2.0 * _EPS, y / n, v)

    return jax.lax.fori_loop(0, iters, body, v)


def _spectral_eigvec(W, h, cfg):
    """Dominant eigenvector of A = W o (h (+) h).

    Routes to the VMEM-resident Pallas kernel on TPU (cfg.use_pallas),
    else the XLA fused-matvec loop."""
    if cfg.use_pallas:
        from relativepose_tpu.ops.pallas_kernels import power_iteration_vmem
        return power_iteration_vmem(W, h, cfg.power_iters)

    def matvec(v):
        y = W @ jnp.stack([v, h * v], axis=-1)
        return h * y[:, 0] + y[:, 1]

    return _power_iteration(matvec, W.shape[-1], cfg.power_iters)


def _irls_rounds(ps, pt, ns, nt, rho, mu, num_rounds):
    """`num_rounds` of IRLS (rpmodule.py:185-205 / :236-255) given base
    per-correspondence pair-weight row-sums `rho`.

    Returns (R, t, mu_s, mu_t) of the LAST Horn solve (the reference
    reweights after solving, so the returned pose precedes the final
    reweight)."""

    def body(_, carry):
        f_pos, f_nrm, _R, _t, _ms, _mt = carry
        w_pos = rho * f_pos
        w_nrm = rho * f_nrm
        mu_s = horn.weighted_centroid(ps, w_pos * mu)
        mu_t = horn.weighted_centroid(pt, w_pos * mu)
        ps_c = ps - mu_s
        pt_c = pt - mu_t
        all_s = jnp.concatenate([ps_c, ns], axis=0)
        all_t = jnp.concatenate([pt_c, nt], axis=0)
        all_w = jnp.concatenate([w_pos * mu, w_nrm], axis=0)
        R = horn.horn87(all_s, all_t, all_w)
        t = mu_t - R @ mu_s
        r_pos = mu * jnp.sum((ps_c @ R.T - pt_c) ** 2, axis=-1)
        r_nrm = jnp.sum((ns @ R.T - nt) ** 2, axis=-1)
        f_pos = f_pos * RES_SIGMA**2 / (RES_SIGMA**2 + r_pos)
        f_nrm = f_nrm * RES_SIGMA**2 / (RES_SIGMA**2 + r_nrm)
        return f_pos, f_nrm, R, t, mu_s, mu_t

    c = ps.shape[0]
    init = (jnp.ones(c), jnp.ones(c), jnp.eye(3), jnp.zeros(3),
            jnp.zeros(3), jnp.zeros(3))
    f_pos, f_nrm, R, t, mu_s, mu_t = jax.lax.fori_loop(
        0, num_rounds, body, init)
    return R, t, mu_s, mu_t


def _residual_scores(ps, pt, ns, nt, R, mu_s, mu_t, mu):
    """h[c] = relu(offset - r[c]) with r the centered residual
    (rpmodule.py:262-266)."""
    r = mu * jnp.sum(((ps - mu_s) @ R.T - (pt - mu_t)) ** 2, axis=-1) + \
        jnp.sum((ns @ R.T - nt) ** 2, axis=-1)
    return jnp.maximum(SPECTRAL_OFFSET - r, 0.0)


def fit_horn87(ps, pt, ns, nt, W, mu):
    """Single weighted Horn solve (rpmodule.py:60-84)."""
    rho = jnp.sum(W, axis=1)
    return horn.fit_rigid(ps, pt, ns, nt, rho, rho, mu)


def fit_irls(ps, pt, ns, nt, W, mu, cfg: SolverStaticConfig):
    """IRLS (rpmodule.py:169-210)."""
    rho = jnp.sum(W, axis=1)
    R, t, _, _ = _irls_rounds(ps, pt, ns, nt, rho, mu, cfg.num_reweighted)
    return R, t


def fit_spectral(ps, pt, ns, nt, W, mu, cfg: SolverStaticConfig):
    """Spectral matching alternation (rpmodule.py:86-167).

    State per alternation: u — the rank-1 pair-weight modulation (ones
    before the first spectral round).
    """
    rho0 = jnp.sum(W, axis=1)
    # initial Horn with the raw pair weights
    R, t = horn.fit_rigid(ps, pt, ns, nt, rho0, rho0, mu)
    mu_s = horn.weighted_centroid(ps, rho0)
    mu_t = horn.weighted_centroid(pt, rho0)
    u = jnp.ones(ps.shape[0])

    def outer(_, carry):
        R, t, mu_s, mu_t, u = carry
        h = _residual_scores(ps, pt, ns, nt, R, mu_s, mu_t, mu)
        # A = (W o u u^T) o (h (+) h) — fold the rank-1 modulation into W
        u_new = _spectral_eigvec(W * u[:, None] * u[None, :], h, cfg)
        # new pair weights W o (u u^T): row sums = u * (W u)
        rho = u_new * (W @ u_new)
        mu_s = horn.weighted_centroid(ps, rho)
        mu_t = horn.weighted_centroid(pt, rho)
        ps_c = ps - mu_s
        pt_c = pt - mu_t
        all_s = jnp.concatenate([ps_c, ns], axis=0)
        all_t = jnp.concatenate([pt_c, nt], axis=0)
        all_w = jnp.concatenate([rho * mu, rho], axis=0)
        R = horn.horn87(all_s, all_t, all_w)
        t = mu_t - R @ mu_s
        return R, t, mu_s, mu_t, u_new

    R, t, _, _, _ = jax.lax.fori_loop(
        0, cfg.num_alter, outer, (R, t, mu_s, mu_t, u))
    return R, t


def fit_irls_sm(ps, pt, ns, nt, W, mu, cfg: SolverStaticConfig):
    """IRLS + spectral-matching composite, the default (rpmodule.py:212-315).

    5 IRLS rounds to initialize, then 5 outer rounds of
    (residual scores -> spectral eigenvector on A = W o (h (+) h) ->
     5 inner IRLS rounds seeded with the rank-1-modulated row sums).
    The spectral matrix always uses the ORIGINAL pair weights W
    (rpmodule.py:265: `np.tile(w_i1i2j1j2, 2) * (offset - r)`).
    """
    rho0 = jnp.sum(W, axis=1)
    R, t, mu_s, mu_t = _irls_rounds(ps, pt, ns, nt, rho0, mu,
                                    cfg.num_reweighted)

    def outer(_, carry):
        R, t, mu_s, mu_t = carry
        h = _residual_scores(ps, pt, ns, nt, R, mu_s, mu_t, mu)
        u = _spectral_eigvec(W, h, cfg)
        rho = u * (W @ u)
        R, t, mu_s, mu_t = _irls_rounds(ps, pt, ns, nt, rho, mu,
                                        cfg.num_reweighted)
        return R, t, mu_s, mu_t

    R, t, _, _ = jax.lax.fori_loop(0, cfg.num_alter, outer,
                                   (R, t, mu_s, mu_t))
    return R, t


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

def estimate_relative_pose(data_s, data_t, hp: SolverHyperParams,
                           cfg: Optional[SolverStaticConfig] = None,
                           return_score: bool = False):
    """Relative pose from two fixed-capacity keypoint sets.

    TPU-shaped equivalent of RelativePoseEstimation_helper
    (rpmodule.py:317-508).  data_s/data_t are dicts with
        'pc'     [K, 3]  keypoint positions
        'normal' [K, 3]  keypoint normals (unit where valid)
        'feat'   [K, F]  descriptors (UNSCALED; divided by 100 here)
        'weight' [K]     1.0 observed / 0.99 unobserved (rputil.py:229-235)
        'valid'  [K]     bool mask for real keypoints
    Returns T [4, 4] (identity on any early-out); with
    `return_score=True`, also an alignment-confidence scalar — the
    affinity-weighted inlier rate of the top-K candidate correspondences
    under the estimated pose (post-hoc ||R ps + t - pt|| < dist_thre).
    The recurrent pipeline's optional best-step selection
    (PipelineConfig.step_select) consumes it; 0 on early-out.
    """
    cfg = cfg or SolverStaticConfig()
    feat_s = data_s["feat"] / FEAT_SCALING
    feat_t = data_t["feat"] / FEAT_SCALING
    valid_s = data_s["valid"]
    valid_t = data_t["valid"]
    w_s = data_s["weight"]
    w_t = data_t["weight"]

    wij = descriptor_affinity(
        feat_s, feat_t, w_s, w_t, valid_s, valid_t, hp.sigma_feat)
    src_idx, tgt_idx, f = _gather_correspondences(wij, cfg.top_k)

    ps = data_s["pc"][src_idx]
    pt = data_t["pc"][tgt_idx]
    ns = data_s["normal"][src_idx]
    nt = data_t["normal"][tgt_idx]
    obs_prod = w_s[src_idx] * w_t[tgt_idx]
    cvalid = valid_s[src_idx] & valid_t[tgt_idx] & (f > 0)

    if cfg.pallas_w_build and jax.default_backend() == "tpu":
        from relativepose_tpu.ops.pallas_kernels import pair_weight_matrix_vmem
        W, counts = pair_weight_matrix_vmem(
            ps, pt, ns, nt, f, obs_prod, cvalid, hp)
    else:
        W, counts = pair_weight_matrix(
            ps, pt, ns, nt, f, obs_prod, cvalid, hp)

    method = cfg.method
    if method == "horn87":
        R, t = fit_horn87(ps, pt, ns, nt, W, hp.mu)
    elif method == "irls":
        R, t = fit_irls(ps, pt, ns, nt, W, hp.mu, cfg)
    elif method == "spectral":
        R, t = fit_spectral(ps, pt, ns, nt, W, hp.mu, cfg)
    elif method == "irls+sm":
        R, t = fit_irls_sm(ps, pt, ns, nt, W, hp.mu, cfg)
    else:
        raise ValueError(f"unknown method {method!r}")

    if cfg.refit_rounds > 0:
        cw0 = f * cvalid.astype(f.dtype)
        inv_2s2 = 1.0 / (2.0 * cfg.refit_sigma ** 2)

        def refit_body(_, carry):
            R, t = carry
            res2 = jnp.sum((ps @ R.T + t - pt) ** 2, axis=-1)
            # 1e-4 floor: keeps the Horn solve conditioned (and its
            # backward finite) when nothing lands within refit_sigma
            w_ref = cw0 * (jnp.exp(-res2 * inv_2s2) + 1e-4)
            R2, t2 = horn.fit_rigid(ps, pt, ns, nt, w_ref, w_ref, hp.mu)
            good = jnp.all(jnp.isfinite(R2)) & jnp.all(jnp.isfinite(t2))
            return (jnp.where(good, R2, R), jnp.where(good, t2, t))

        R, t = jax.lax.fori_loop(0, cfg.refit_rounds, refit_body, (R, t))

    if cfg.trans_refine_rounds > 0:
        # vote weights: W row-sums — each correspondence's total pairwise
        # consistency support (descriptor x distance x angle filters) —
        # not the raw descriptor affinity, so correspondences the filter
        # chain already distrusts barely vote
        cw0 = jnp.sum(W, axis=1) * cvalid.astype(f.dtype)
        s2 = cfg.trans_refine_sigma ** 2
        votes = pt - ps @ R.T        # [C, 3] translation votes under R

        def tr_body(_, t):
            r2 = jnp.sum((votes - t) ** 2, axis=-1)
            g = cw0 * (s2 / (s2 + r2))   # Geman-McClure, grad-safe
            den = jnp.sum(g)
            t2 = jnp.sum(g[:, None] * votes, axis=0) / (den + 1e-12)
            good = (den > 1e-8) & jnp.all(jnp.isfinite(t2))
            return jnp.where(good, t2, t)

        t = jax.lax.fori_loop(0, cfg.trans_refine_rounds, tr_body, t)

    # early-outs (rpmodule.py:346, :377, :406, :440, :469)
    ok = (
        (jnp.sum(valid_s) >= 3)
        & (jnp.sum(valid_t) >= 3)
        & (jnp.sum(cvalid) >= 3)
        & (counts["dist"] >= 3)
        & (counts["dist_angle"] >= 3)
        & (counts["nonzero_w"] >= 1)
    )
    finite = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
    ok = ok & finite

    T = jnp.eye(4)
    T = T.at[:3, :3].set(jnp.where(ok, R, jnp.eye(3)))
    T = T.at[:3, 3].set(jnp.where(ok, t, jnp.zeros(3)))
    if not return_score:
        return T
    res = jnp.linalg.norm(ps @ T[:3, :3].T + T[:3, 3] - pt, axis=-1)
    cw = f * cvalid.astype(f.dtype)
    inlier = jnp.sum(cw * (res < hp.dist_thre)) / (jnp.sum(cw) + 1e-12)
    return T, jnp.where(ok, inlier, 0.0)
