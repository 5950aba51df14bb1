"""Batched symmetric 4x4 eigensolver (cyclic Jacobi), jittable.

The reference relies on LAPACK `np.linalg.eig` on the 4x4 Horn'87 N-matrix
(rpmodule.py:50, util.py:323), which is host-only and unbatched.  TPU has no
general eigensolver in the hot path, so we run a fixed number of cyclic
Jacobi sweeps: each sweep annihilates the 6 off-diagonal pairs with Givens
rotations.  For 4x4 symmetric matrices ~8 sweeps reach float32 round-off.

Fully batched over leading dimensions and differentiable (piecewise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST

_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
_EPS = 1e-20


def _jacobi_rotation(app, aqq, apq):
    """Return (c, s) of the Givens rotation zeroing a_pq (batched scalars)."""
    # theta = (aqq - app) / (2 apq); t = sign/(|theta|+sqrt(1+theta^2))
    safe_apq = jnp.where(jnp.abs(apq) < _EPS, 1.0, apq)
    theta = (aqq - app) / (2.0 * safe_apq)
    # clip |theta|: beyond 1e6 the rotation is < 5e-7 rad (below f32
    # resolution of the updated entries) but theta^2 overflows f32 to inf,
    # whose BACKWARD (theta/sqrt(1+theta^2) = inf/inf) is NaN and poisons
    # pose-loss fine-tuning through Horn'87
    theta = jnp.clip(theta, -1e6, 1e6)
    t = jnp.sign(theta) / (jnp.abs(theta) + jnp.sqrt(1.0 + theta * theta))
    t = jnp.where(theta == 0, 1.0, t)  # 45 deg when diagonal entries equal
    t = jnp.where(jnp.abs(apq) < _EPS, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    return c, t * c


def eigh4x4(A, sweeps: int = 8):
    """Eigendecomposition of symmetric A [..., 4, 4].

    Returns (eigenvalues [..., 4], eigenvectors [..., 4, 4]) with
    eigenvectors in columns (A v_i = w_i v_i), unordered.
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    batch = A.shape[:-2]
    V = jnp.broadcast_to(jnp.eye(4, dtype=A.dtype), A.shape)

    def sweep(_, carry):
        A, V = carry
        for p, q in _PAIRS:
            c, s = _jacobi_rotation(A[..., p, p], A[..., q, q], A[..., p, q])
            G = jnp.broadcast_to(jnp.eye(4, dtype=A.dtype), A.shape)
            G = G.at[..., p, p].set(c)
            G = G.at[..., q, q].set(c)
            G = G.at[..., p, q].set(s)
            G = G.at[..., q, p].set(-s)
            A = jnp.matmul(jnp.matmul(jnp.swapaxes(G, -1, -2), A, precision=_HP), G, precision=_HP)
            V = jnp.matmul(V, G, precision=_HP)
        return A, V

    A, V = jax.lax.fori_loop(0, sweeps, sweep, (A, V))
    return jnp.diagonal(A, axis1=-2, axis2=-1), V


def max_eigvec4x4(A, sweeps: int = 8):
    """Dominant (largest-eigenvalue) unit eigenvector of symmetric A [...,4,4].

    This is the operation Horn'87 needs (rpmodule.py:50-53: `eig` then
    `argmax` over eigenvalues).
    """
    w, V = eigh4x4(A, sweeps=sweeps)
    idx = jnp.argmax(w, axis=-1)
    v = jnp.take_along_axis(V, idx[..., None, None].repeat(4, axis=-2), axis=-1)
    v = v[..., 0]
    # grad-safe normalization (see match/solver.py): sqrt(sum^2 + eps)
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-24)
