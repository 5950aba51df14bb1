"""Pallas TPU kernels for the solver's hot loops.

`power_iteration_vmem`: dominant-eigenvector power iteration for the
spectral consistency operator A = W o (h (+) h) (solver.py).  The XLA
version streams the [C, C] pair-weight matrix W from HBM twice per
iteration (~6 MB x 2 x iters x outer-rounds per pair); this kernel parks W
in VMEM once (bfloat16, ~5.9 MB at C=1720 padded to 1792) and runs every
iteration on-chip: the MXU sees a [C, 2]-column matmul per step and HBM
sees W exactly once.

Numerical notes: W is cast to bfloat16 for storage (power iteration on a
non-negative symmetric matrix is insensitive to mantissa truncation; the
caller recomputes the final row-sums with the f32 W), accumulation is f32
via preferred_element_type.  Falls back to the pure-XLA matvec loop on
non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_ROW_TILE = 256


def _power_kernel(w_ref, h_ref, u_ref, y_ref, iters: int):
    """W stays VMEM-resident in w_ref; the matmul streams row tiles out of
    the ref (scratch y_ref accumulates) so per-iteration working set stays
    ~ ROW_TILE x C, well under the 16 MB scoped-vmem budget."""
    c = w_ref.shape[0]
    n_tiles = c // _ROW_TILE

    def body(_, v):
        # A v = h * (W v) + W (h v): one [C, 2] matmul in row tiles
        hv = h_ref[:] * v
        x = jnp.concatenate([v, hv], axis=1).astype(w_ref.dtype)

        def tile(i, carry):
            y_ref[pl.ds(i * _ROW_TILE, _ROW_TILE), :] = jnp.dot(
                w_ref[pl.ds(i * _ROW_TILE, _ROW_TILE), :], x,
                preferred_element_type=jnp.float32)
            return carry

        jax.lax.fori_loop(0, n_tiles, tile, 0)
        y = y_ref[:]
        v_new = h_ref[:] * y[:, 0:1] + y[:, 1:2]
        nrm = jnp.sqrt(jnp.sum(v_new * v_new))
        return jnp.where(nrm > 1e-12, v_new / jnp.maximum(nrm, 1e-12), v)

    v0 = jnp.ones((c, 1), jnp.float32)
    u_ref[:] = jax.lax.fori_loop(0, iters, body, v0)


@functools.partial(jax.jit, static_argnames=("iters",))
def _power_iteration_pallas(W, h, iters: int):
    c = W.shape[-1]
    cp = _round_up(c, _ROW_TILE)
    pad = cp - c
    Wp = jnp.pad(W, ((0, pad), (0, pad))).astype(jnp.bfloat16)
    hp = jnp.pad(h, (0, pad))[:, None]
    # explicit (trivial) grid so a vmap over pairs becomes an extra grid
    # dimension processing ONE pair's W per program (keeps VMEM bounded)
    u = pl.pallas_call(
        functools.partial(_power_kernel, iters=iters),
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct((cp, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec((cp, cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cp, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((cp, 2), jnp.float32)],
    )(Wp, hp)
    return u[:c, 0]


_W_TILE = 256
# packed component rows: ps(0:3) pt(3:6) ns(6:9) nt(9:12) f(12) obs(13)
# valid(14) pad(15)
_N_COMP = 16


def _wbuild_kernel(hp_ref, rows_ref, cols_ref, w_ref, counts_ref):
    """One [T, T] tile of the pair-consistency weight matrix.

    rows_ref: [T, 16] packed row-side components (transposed layout so each
    component slices to a [T, 1] sublane vector); cols_ref: [16, T] packed
    col-side components ([1, T] lane vectors).  Every pairwise quantity is
    a broadcast [T,1] op [1,T] on the VPU — nothing [C, C]-sized ever
    touches HBM except the single W tile written out.

    The math mirrors match/solver.py::pair_weight_matrix exactly
    (rpmodule.py:382-467 semantics); the upper-mask + transpose of the XLA
    version reduces to zeroing the diagonal because every term is
    symmetric (beta^T == gamma).
    """
    i, j = pl.program_id(0), pl.program_id(1)
    t = w_ref.shape[0]
    eps = 1e-12

    def row(k):
        return rows_ref[:, k : k + 1]

    def col(k):
        return cols_ref[k : k + 1, :]

    s_a1, s_a2, s_d = hp_ref[0, 0], hp_ref[0, 1], hp_ref[0, 2]
    dist_thre, dist_sep_thre = hp_ref[0, 3], hp_ref[0, 4]
    angle_thre = hp_ref[0, 5]

    dxs = row(0) - col(0)
    dys = row(1) - col(1)
    dzs = row(2) - col(2)
    dxt = row(3) - col(3)
    dyt = row(4) - col(4)
    dzt = row(5) - col(5)
    dis_s = jnp.sqrt(dxs * dxs + dys * dys + dzs * dzs)
    dis_t = jnp.sqrt(dxt * dxt + dyt * dyt + dzt * dzt)
    d2 = (dis_s - dis_t) ** 2
    dist_ok = (d2 < dist_thre * dist_thre) & (
        jnp.minimum(dis_s, dis_t) > 1.5 * dist_sep_thre * dist_sep_thre)
    inv_s = 1.0 / jnp.maximum(dis_s, eps)
    inv_t = 1.0 / jnp.maximum(dis_t, eps)

    def acos(x):
        """arccos for x in [-1, 1]; Mosaic has no acos lowering, so use
        the Abramowitz & Stegun 4.4.46 polynomial (|err| <= 2e-8 rad —
        below f32 arccos rounding): arccos(x) = sqrt(1-x) * P(x) on
        [0, 1], reflected via arccos(-x) = pi - arccos(x)."""
        ax = jnp.abs(x)
        p = jnp.float32(-0.0012624911)
        for coef in (0.0066700901, -0.0170881256, 0.0308918810,
                     -0.0501743046, 0.0889789874, -0.2145988016,
                     1.5707963050):
            p = p * ax + jnp.float32(coef)
        y = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
        return jnp.where(x < 0.0, jnp.float32(np.pi) - y, y)

    def ang_diff_sq(a, b):
        # strict-interior clip, mirroring the XLA build's gradient-safe
        # form (match/solver.py::ang_diff_sq) so the two builds stay
        # bit-comparable
        lim = jnp.float32(1.0 - 1e-7)
        a = jnp.clip(a, -lim, lim)
        b = jnp.clip(b, -lim, lim)
        c = a * b + jnp.sqrt((1.0 - a * a) * (1.0 - b * b) + 1e-20)
        return acos(jnp.clip(c, -lim, lim)) ** 2

    nn_s = row(6) * col(6) + row(7) * col(7) + row(8) * col(8)
    nn_t = row(9) * col(9) + row(10) * col(10) + row(11) * col(11)
    alpha = ang_diff_sq(nn_s, nn_t)
    ne1_row = (row(6) * dxs + row(7) * dys + row(8) * dzs) * inv_s
    ne2_row = (row(9) * dxt + row(10) * dyt + row(11) * dzt) * inv_t
    beta = ang_diff_sq(ne1_row, ne2_row)
    ne1_col = (col(6) * dxs + col(7) * dys + col(8) * dzs) * inv_s
    ne2_col = (col(9) * dxt + col(10) * dyt + col(11) * dzt) * inv_t
    gamma = ang_diff_sq(ne1_col, ne2_col)
    a2 = angle_thre * angle_thre
    angle_ok = (alpha < a2) & (beta < a2) & (gamma < a2)

    # (beta + gamma) grouped BEFORE the subtraction chain: beta^T == gamma
    # bitwise, and addition commutes, so the grouped sum (hence W) is
    # bitwise symmetric — matching the XLA build's explicit symmetrization
    w = row(12) * col(12) * jnp.exp(
        -d2 / (2.0 * s_d * s_d)
        - alpha / (2.0 * s_a1 * s_a1)
        - (beta + gamma) / (2.0 * s_a2 * s_a2)
    )
    all_obs = (row(13) * col(13)) == 1.0
    w = jnp.where(all_obs, w, w * 0.6)
    pair_valid = (row(14) * col(14)) > 0.5

    row_g = i * t + jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col_g = j * t + jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    keep = dist_ok & angle_ok & pair_valid & (row_g != col_g)
    w_out = jnp.where(keep, w, 0.0)
    w_ref[:, :] = w_out

    upper = (row_g < col_g) & pair_valid
    c0 = jnp.sum((dist_ok & upper).astype(jnp.float32))
    c1 = jnp.sum((dist_ok & angle_ok & upper).astype(jnp.float32))
    c2 = jnp.sum(((w_out != 0.0) & (row_g < col_g)).astype(jnp.float32))
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
    tile_counts = (
        jnp.where(lane == 0, c0, 0.0)
        + jnp.where(lane == 1, c1, 0.0)
        + jnp.where(lane == 2, c2, 0.0)
    )

    @pl.when((i == 0) & (j == 0))
    def _():
        counts_ref[:, :] = jnp.zeros_like(counts_ref)

    counts_ref[:, :] += tile_counts


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pair_weight_matrix_pallas(packed_rows, packed_cols, hp_vec,
                               interpret: bool = False):
    """packed_rows: [Cp, 16]; packed_cols: [16, Cp]; hp_vec: [1, 8] f32."""
    cp = packed_rows.shape[0]
    n = cp // _W_TILE
    w, counts = pl.pallas_call(
        _wbuild_kernel,
        grid=(n, n),
        out_shape=(
            jax.ShapeDtypeStruct((cp, cp), jnp.float32),
            jax.ShapeDtypeStruct((8, LANE), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_W_TILE, _N_COMP), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_N_COMP, _W_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_W_TILE, _W_TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(hp_vec, packed_rows, packed_cols)
    return w, counts


def pair_weight_matrix_vmem(ps, pt, ns, nt, f, obs_prod, cvalid, hp,
                            interpret: bool = False):
    """Fused pair-consistency W build; drop-in for the XLA version.

    ps/pt/ns/nt: [C, 3]; f/obs_prod: [C]; cvalid: [C] bool; hp is a
    SolverHyperParams.  Returns (W [C, C] f32, counts dict with int32
    'dist' / 'dist_angle' / 'nonzero_w') — same contract as
    match/solver.py::pair_weight_matrix.

    The XLA version materializes ~15 [C, C] f32 temporaries through HBM;
    here each [T, T] tile is built entirely in VMEM from [T]-sized inputs
    and only W leaves the chip.  Safe under vmap (leading grid dim).
    """
    c = ps.shape[0]
    cp = _round_up(c, _W_TILE)
    pad = cp - c

    comps = jnp.stack(
        [ps[:, 0], ps[:, 1], ps[:, 2], pt[:, 0], pt[:, 1], pt[:, 2],
         ns[:, 0], ns[:, 1], ns[:, 2], nt[:, 0], nt[:, 1], nt[:, 2],
         f, obs_prod, cvalid.astype(jnp.float32),
         jnp.zeros_like(f)], axis=0)  # [16, C]
    comps = jnp.pad(comps, ((0, 0), (0, pad)))
    hp_vec = jnp.stack(
        [jnp.asarray(hp.sigma_angle1, jnp.float32),
         jnp.asarray(hp.sigma_angle2, jnp.float32),
         jnp.asarray(hp.sigma_dist, jnp.float32),
         jnp.asarray(hp.dist_thre, jnp.float32),
         jnp.asarray(hp.dist_sep_thre, jnp.float32),
         jnp.asarray(hp.angle_thre, jnp.float32),
         jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)])[None, :]

    w, counts = _pair_weight_matrix_pallas(
        comps.T, comps, hp_vec, interpret=interpret)
    w = w[:c, :c]
    counts = {
        "dist": counts[0, 0].astype(jnp.int32),
        "dist_angle": counts[1, 0].astype(jnp.int32),
        "nonzero_w": counts[2, 0].astype(jnp.int32),
    }
    return w, counts


def power_iteration_vmem(W, h, iters: int):
    """Dominant eigenvector of W o (h (+) h); W: [C, C] f32, h: [C] f32.

    Uses the VMEM-resident Pallas kernel on TPU, an XLA loop elsewhere.
    Safe under vmap (maps to a leading pallas grid dimension).
    """
    if jax.default_backend() != "tpu":
        def matvec(v):
            y = W @ jnp.stack([v, h * v], axis=-1)
            return h * y[..., 0] + y[..., 1]

        def body(_, v):
            y = matvec(v)
            n = jnp.linalg.norm(y)
            return jnp.where(n > 1e-12, y / jnp.maximum(n, 1e-12), v)

        return jax.lax.fori_loop(0, iters, body, jnp.ones(W.shape[-1]))
    return _power_iteration_pallas(W, h, iters)
