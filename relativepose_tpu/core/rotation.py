"""Rotation helpers: elementary rotations, geodesic distance, perturbations.

Mirrors `util.py:176-187` (angular_distance_np), `util.py:234-240`
(randomRotation) and `util.py:935-960` (Rz/Ry/Rx) as batched jax ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST


def rx(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [o, z, z, z, c, -s, z, s, c], axis=-1
    ).reshape(jnp.shape(theta) + (3, 3))


def ry(phi):
    c, s = jnp.cos(phi), jnp.sin(phi)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [c, z, s, z, o, z, -s, z, c], axis=-1
    ).reshape(jnp.shape(phi) + (3, 3))


def rz(psi):
    c, s = jnp.cos(psi), jnp.sin(psi)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [c, -s, z, s, c, z, z, z, o], axis=-1
    ).reshape(jnp.shape(psi) + (3, 3))


def angular_distance(R_hat, R):
    """Geodesic distance in degrees between rotations [..., 3, 3]."""
    rel = jnp.einsum("...ij,...kj->...ik", R_hat, R, precision=_HP)
    tr = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    return jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)))


def axis_angle_to_rot(axis, theta):
    """Rodrigues formula. axis: [..., 3] (unit), theta: [...]."""
    ax, ay, az = jnp.moveaxis(axis, -1, 0)
    zeros = jnp.zeros_like(ax)
    K = jnp.stack(
        [zeros, -az, ay, az, zeros, -ax, -ay, ax, zeros], axis=-1
    ).reshape(jnp.shape(ax) + (3, 3))
    s = jnp.sin(theta)[..., None, None]
    c = jnp.cos(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), K.shape)
    return eye + s * K + (1.0 - c) * jnp.matmul(K, K, precision=_HP)


def random_rotation(key, epsilon, shape=()):
    """Random small rotation like util.py:234-240.

    axis ~ uniform direction, angle ~ N(0, 1) * pi * epsilon.
    Returns [..., 3, 3] for the given batch `shape`.
    """
    k1, k2 = jax.random.split(key)
    axis = jax.random.uniform(k1, shape + (3,)) - 0.5
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    theta = jax.random.normal(k2, shape) * jnp.pi * epsilon
    return axis_angle_to_rot(axis, theta)


def make_se3(R, t):
    """Assemble a [..., 4, 4] rigid transform from R [..., 3, 3], t [..., 3]."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def inverse_se3(T):
    """Invert a rigid [..., 4, 4] transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -jnp.einsum("...ij,...j->...i", Rinv, t, precision=_HP)
    return make_se3(Rinv, tinv)
