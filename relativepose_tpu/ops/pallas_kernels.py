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
