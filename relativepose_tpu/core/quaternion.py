"""Quaternion algebra, batched and jittable.

Covers the capabilities of the reference's `quaternion.py` (qconj/qmul/qrot/
qeuler + numpy variants, /root/reference/quaternion.py:14-217) and the
rotation<->quaternion converters in `util.py:411-455`.  Everything here is
pure `jax.numpy`, shape-polymorphic over leading batch dimensions, and safe
under `jit`/`vmap`/`grad`.

Convention: quaternions are (w, x, y, z) with w the scalar part, matching the
reference ("Hamilton" convention; quaternion.py:24-31).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def qconj(q):
    """Conjugate. q: [..., 4]."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qmul(q, r):
    """Hamilton product q*r. q, r: [..., 4] -> [..., 4]."""
    w1, x1, y1, z1 = jnp.moveaxis(q, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(r, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        ],
        axis=-1,
    )


def qrot(q, v):
    """Rotate vectors v [..., 3] by quaternions q [..., 4]."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qnormalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quaternion_to_rot(q):
    """Quaternion [..., 4] -> rotation matrix [..., 3, 3].

    Same element layout as the reference (util.py:442-455, rpmodule.py:54-56).
    Assumes unit quaternions.
    """
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            w * w + x * x - y * y - z * z,
            2.0 * (x * y - w * z),
            2.0 * (w * y + x * z),
            2.0 * (x * y + w * z),
            w * w - x * x + y * y - z * z,
            2.0 * (y * z - w * x),
            2.0 * (x * z - w * y),
            2.0 * (w * x + y * z),
            w * w - x * x - y * y + z * z,
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def rot_to_quaternion(R):
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4], (w,x,y,z).

    Branchless version of the pivot method used by the reference
    (util.py:411-440): build all four candidate quaternions scaled by
    4*component^2, pick the numerically largest pivot.  Always returns w>=0.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # candidate k: quaternion * (2*sqrt(1 +- ...)) with pivot component k
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)

    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4(cand), 4(comp)]
    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22,
         1.0 + m22 - m00 - m11],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(
        cands, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    q = qnormalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def expmap_to_quaternion(e):
    """Axis-angle exponential map [..., 3] -> quaternion [..., 4].

    Mirrors quaternion.py:138-154.
    """
    theta = jnp.linalg.norm(e, axis=-1, keepdims=True)
    half = 0.5 * theta
    w = jnp.cos(half)
    # sinc-stable sin(theta/2)/theta
    s = jnp.where(theta > _EPS, jnp.sin(half) / jnp.maximum(theta, _EPS), 0.5)
    return jnp.concatenate([w, s * e], axis=-1)


def euler_to_quaternion(e, order: str = "zyx"):
    """Euler angles [..., 3] (radians, per-axis in `order`) -> quaternion."""
    axes = {"x": jnp.array([1.0, 0.0, 0.0]),
            "y": jnp.array([0.0, 1.0, 0.0]),
            "z": jnp.array([0.0, 0.0, 1.0])}
    q = None
    for i, ax in enumerate(order):
        half = 0.5 * e[..., i : i + 1]
        qi = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axes[ax]], axis=-1)
        q = qi if q is None else qmul(q, qi)
    return q


def qeuler(q, order: str = "zyx"):
    """Quaternion [..., 4] -> euler angles (radians).

    Angles are returned in the same per-axis order as the order string, so
    `euler_to_quaternion(qeuler(q, o), o)` round-trips.  Supports the orders
    used by the reference (quaternion.py:60-107).
    """
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    if order == "xyz":
        ex = jnp.arctan2(2.0 * (x * w - y * z), 1.0 - 2.0 * (x * x + y * y))
        ey = jnp.arcsin(jnp.clip(2.0 * (x * z + y * w), -1.0, 1.0))
        ez = jnp.arctan2(2.0 * (z * w - x * y), 1.0 - 2.0 * (y * y + z * z))
        return jnp.stack([ex, ey, ez], axis=-1)
    if order == "zyx":
        ex = jnp.arctan2(2.0 * (x * w + y * z), 1.0 - 2.0 * (x * x + y * y))
        ey = jnp.arcsin(jnp.clip(2.0 * (y * w - x * z), -1.0, 1.0))
        ez = jnp.arctan2(2.0 * (z * w + x * y), 1.0 - 2.0 * (y * y + z * z))
        return jnp.stack([ez, ey, ex], axis=-1)
    raise ValueError(f"unsupported euler order {order!r}")


def qfix(q):
    """Enforce sign continuity along the first (time) axis. q: [T, ..., 4].

    Mirrors quaternion.py:160-177: flip each quaternion so consecutive
    frames have non-negative dot product.
    """
    dots = jnp.sum(q[1:] * q[:-1], axis=-1)
    flips = jnp.cumprod(jnp.where(dots < 0, -1.0, 1.0), axis=0)
    return jnp.concatenate([q[:1], q[1:] * flips[..., None]], axis=0)
