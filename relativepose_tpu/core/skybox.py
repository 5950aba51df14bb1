"""Skybox (4-face cubemap strip) camera model, batched on device.

Each view is a 160x640 panorama made of four 160x160 pinhole faces with
90-degree FOV.  Face-local camera coords: pixel (x, y) in [0, F)^2 maps to
NDC xs = (x/F - 0.5)*2, ys = (0.5 - y/F)*2, and depth z>0 lifts to the
camera-space point (xs*z, ys*z, -z).  Pano column-block j looks through
rotation `FACE_ROTATIONS[FACE_ORDER[dataset][j]]` (dataset-dependent face
order — the reference's "dataset inconsistency hack", util.py:751-811).

Re-implements, fixed-shape and jittable:
  * `pano_to_pointcloud`   <- util.py:751-811  (Pano2PointCloud)
  * `face_depth_to_pointcloud` / kinect variants <- util.py:468-523 (depth2pc)
  * `splat_to_pano`        <- util.py:537-749  (reproj_helper)
  * `pano_idx`             <- util.py:525-535  (PanoIdx)
  * `lift_keypoints`       <- RPModule/rputil.py:61-119 (getPixel[_helper])

Instead of boolean-filtered variable-length point lists, every function
returns fixed-shape arrays plus validity masks (weight-0 padding), which is
what makes the downstream matching/solver stages compilable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from relativepose_tpu import config
import jax

_HP = jax.lax.Precision.HIGHEST

FACE = config.FACE


def face_rotations(dataset: str, dtype=jnp.float32):
    """[4, 3, 3] rotation for each pano column block of `dataset`."""
    order = config.FACE_ORDER[config.canonical_dataset(dataset)]
    return jnp.asarray(config.FACE_ROTATIONS[list(order)], dtype=dtype)


def _face_ndc(h: int = FACE, w: int = FACE):
    """Per-pixel NDC grids (xs, ys) for an h x w face, numpy constants."""
    ys, xs = np.meshgrid(range(h), range(w), indexing="ij")
    ys = (0.5 - ys / h) * 2.0
    xs = (xs / w - 0.5) * 2.0
    return xs.astype(np.float32), ys.astype(np.float32)


def pano_to_pointcloud(depth, dataset: str):
    """Lift a full pano depth map to camera-0 points.

    depth: [..., FACE, 4*FACE] -> (points [..., 4*FACE*FACE, 3],
    valid [..., 4*FACE*FACE]).  Point order matches the reference's
    Pano2PointCloud: face-major, row-major within a face (util.py:762-772),
    so flat indices line up with `pano_idx`.  Zero-depth pixels produce the
    origin with valid=False (the reference drops them for scannet and keeps
    them for suncg/matterport; callers decide via the mask).
    """
    ds = config.canonical_dataset(dataset)
    rots = face_rotations(ds, dtype=depth.dtype)  # [4,3,3]
    xs, ys = _face_ndc()
    xs = jnp.asarray(xs.reshape(-1))
    ys = jnp.asarray(ys.reshape(-1))

    faces = jnp.split(depth, 4, axis=-1)  # 4 x [..., F, F]
    pcs, valids = [], []
    for j in range(4):
        z = faces[j].reshape(depth.shape[:-2] + (-1,))  # [..., F*F]
        if ds == "scannet":
            # kinect intrinsics fudge factors (util.py:806)
            x = xs * z / config.KINECT_FX_DIV
            y = ys * z / config.KINECT_FY_DIV
        else:
            x = xs * z
            y = ys * z
        cam = jnp.stack([x, y, -z], axis=-1)  # [..., F*F, 3]
        world = jnp.einsum("ij,...nj->...ni", rots[j], cam, precision=_HP)
        pcs.append(world)
        valids.append(z != 0)
    return jnp.concatenate(pcs, axis=-2), jnp.concatenate(valids, axis=-1)


def face_depth_to_pointcloud(depth, dataset: str, second_face: bool = None):
    """Lift a single 160x160 face depth map ("the observed face").

    Mirrors depth2pc for suncg/matterport (util.py:470-497): NDC lift with
    z>0 -> (xs*z, ys*z, -z); for suncg the result is additionally rotated by
    FACE_ROTATIONS[1] ("assume second view", util.py:484).

    depth: [..., FACE, FACE] -> (points [..., FACE*FACE, 3], valid).
    """
    ds = config.canonical_dataset(dataset)
    if second_face is None:
        second_face = ds == "suncg"
    xs, ys = _face_ndc()
    xs = jnp.asarray(xs.reshape(-1))
    ys = jnp.asarray(ys.reshape(-1))
    z = depth.reshape(depth.shape[:-2] + (-1,))
    pc = jnp.stack([xs * z, ys * z, -z], axis=-1)
    if second_face:
        R1 = jnp.asarray(config.FACE_ROTATIONS[1], dtype=depth.dtype)
        pc = jnp.einsum("ij,...nj->...ni", R1, pc, precision=_HP)
    return pc, z != 0


def kinect_crop_to_pointcloud(depth):
    """Lift the 66x88 kinect crop (scannet 'ours' path, util.py:511-521).

    depth: [..., 66, 88] -> (points [..., 66*88, 3], valid).
    """
    h, w = config.KINECT_FOV_H, config.KINECT_FOV_W
    xs, ys = _face_ndc(h, w)
    xs = jnp.asarray(xs.reshape(-1))
    ys = jnp.asarray(ys.reshape(-1))
    z = depth.reshape(depth.shape[:-2] + (-1,))
    pc = jnp.stack(
        [xs * z * (w / 160.0), ys * z * (h / 160.0), -z], axis=-1
    )
    return pc, z != 0


def kinect_full_to_pointcloud(depth):
    """Lift a full-size 480x640 kinect depth map (util.py:500-510)."""
    h, w = config.KINECT_FULL_H, config.KINECT_FULL_W
    xs, ys = _face_ndc(h, w)
    xs = jnp.asarray(xs.reshape(-1))
    ys = jnp.asarray(ys.reshape(-1))
    z = depth.reshape(depth.shape[:-2] + (-1,))
    pc = jnp.stack(
        [xs * z / config.KINECT_FX_DIV, ys * z / config.KINECT_FY_DIV, -z],
        axis=-1,
    )
    return pc, z != 0


def pano_idx(flat_index, h: int = FACE, w: int = 4 * FACE):
    """Flat pointcloud index -> (x, y) pano pixel coords (util.py:525-535)."""
    single = (h * w) // 4
    face = flat_index // single
    rest = flat_index % single
    ys = rest // h
    xs = rest % h + face * h
    return jnp.stack([xs, ys], axis=-1)


def splat_to_pano(points, values, valid, dataset: str, num_channels: int):
    """Forward-splat world points onto the 4-face pano (nearest pixel).

    Re-implements reproj_helper (util.py:537-749): for each face, rotate
    points into the face frame, perspective-divide by |z|, keep points with
    z<0 and |x|,|y|<1, round to the nearest pixel, and write values.  The
    reference writes faces in pano-block order [0, 3, 2, 1] with plain numpy
    assignment (later writes win); we apply the scatters in the same order.

    points: [..., N, 3]; values: [..., N, C]; valid: [..., N] bool.
    Returns (pano [..., FACE, 4*FACE, C], depth [..., FACE, 4*FACE]) where
    `depth` is the splatted -z (the reference's 'depth' mode).
    """
    ds = config.canonical_dataset(dataset)
    order = config.FACE_ORDER[ds]
    H = FACE
    batch = points.shape[:-2]

    # The 4 faces partition direction space (90-degree FOV each), so each
    # point lands on at most one face and ONE scatter covers all blocks.
    # The face loop is unrolled with every intermediate shaped [..., N] so N
    # stays the minor (lane) dimension: a [..., N, 4, 3] einsum intermediate
    # pays (8,128)-tile padding on TPU and measured 13 ms of this stage's
    # 21 ms at B=8 (tools/splat_exp2.py).  The rotations are signed axis
    # permutations, so rotating is free component shuffles; the perspective
    # test |l_xy| < |l_z| + eps needs no division.
    px, py, pz = points[..., 0], points[..., 1], points[..., 2]
    comps = (px, py, pz)
    any_ok = jnp.zeros(valid.shape, bool)
    block = jnp.zeros(valid.shape, jnp.int32)
    zero = jnp.zeros_like(px)
    lxs, lys, lzs = zero, zero, zero
    for f in range(4):
        R = config.FACE_ROTATIONS[order[f]]
        lx = _rot_component(R, 0, comps)
        ly = _rot_component(R, 1, comps)
        lz = _rot_component(R, 2, comps)
        lim = 1e-32 - lz  # == |l_z| + 1e-32 when l_z < 0 (the only ok case)
        ok = valid & (lz < 0) & (jnp.abs(lx) < lim) & (jnp.abs(ly) < lim)
        take = ok & ~any_ok  # first valid face wins (argmax semantics)
        block = jnp.where(take, f, block)
        lxs = jnp.where(take, lx, lxs)
        lys = jnp.where(take, ly, lys)
        lzs = jnp.where(take, lz, lzs)
        any_ok = any_ok | ok
    denom = jnp.abs(lzs) + 1e-32
    xs = lxs / denom
    ys = lys / denom
    zs = lzs
    u = jnp.clip(jnp.round((xs + 1.0) * 0.5 * H), 0, H - 1).astype(jnp.int32)
    v = jnp.clip(jnp.round((1.0 - ys) * 0.5 * H), 0, H - 1).astype(jnp.int32)
    u = u + block * H

    # invalid points go to a trash slot one past the end of the flat pano
    M = H * 4 * H
    flat = jnp.where(any_ok, v * (4 * H) + u, M)
    payload = jnp.concatenate([values, -zs[..., None]], axis=-1)
    # Duplicate resolution: scatter-max the point INDEX (one int32 channel —
    # measured 26% faster than scattering the 7-channel payload, and a
    # commutative reduction besides), then gather the winners' payload rows.
    # "Highest point index wins" is as deterministic as the reference's
    # incidental numpy write order (see PARITY.md).
    n = points.shape[-2]
    pos = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32), flat.shape)
    idxbuf = jnp.full(batch + (M + 1,), -1, jnp.int32)
    idxbuf = _scatter_max_last1(idxbuf, flat, pos)[..., :M]
    hit = idxbuf >= 0
    sel = jnp.maximum(idxbuf, 0)
    rows = jnp.take_along_axis(payload, sel[..., None], axis=-2)
    rows = jnp.where(hit[..., None], rows, 0.0)
    pano = rows[..., :num_channels].reshape(batch + (H, 4 * H, num_channels))
    depth = rows[..., num_channels].reshape(batch + (H, 4 * H))
    return pano, depth


def _rot_component(R, i, comps):
    """Component i of R^T p for a signed-permutation numpy constant R.

    Folds the 0/+-1 coefficients at trace time so the "rotation" costs no
    flops and no [..., 3]-shaped intermediates.
    """
    out = None
    for j in range(3):
        c = float(R[j, i])
        if c == 0.0:
            continue
        term = comps[j] if c == 1.0 else (
            -comps[j] if c == -1.0 else c * comps[j])
        out = term if out is None else out + term
    return out if out is not None else jnp.zeros_like(comps[0])


def _scatter_max_last1(buf, idx, vals):
    """buf [..., M] .at[..., idx] <- max(vals) (commutative reduction)."""
    if buf.ndim == 1:
        return buf.at[idx].max(vals)
    assert buf.ndim == 2, buf.shape
    b = jnp.arange(buf.shape[0])[:, None]
    return buf.at[b, idx].max(vals)


def lift_keypoints(depth, normal, pts, dataset: str):
    """Bilinear depth/normal at subpixel pano keypoints + 3D lift.

    Re-implements getPixel (rputil.py:88-119): bilinearly interpolate depth
    and normal at pts, then invert the skybox projection of the face that
    contains each point.  The face rotation follows the dataset's face order
    (rputil.py:75-78).

    depth: [FACE, 4*FACE]; normal: [FACE, 4*FACE, 3]; pts: [N, 2] float
    (x, y) pano coords.  Returns (pc [N, 3], nrm [N, 3]).
    """
    ds = config.canonical_dataset(dataset)
    rots = face_rotations(ds, dtype=depth.dtype)
    H = FACE
    x, y = pts[:, 0], pts[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    xi1 = jnp.clip(xi + 1, 0, 4 * H - 1)
    yi1 = jnp.clip(yi + 1, 0, H - 1)
    xi = jnp.clip(xi, 0, 4 * H - 1)
    yi = jnp.clip(yi, 0, H - 1)
    wx1, wy1 = x - x0, y - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1

    def bilerp(img):
        return (
            img[yi, xi] * (wy0 * wx0)[..., None]
            + img[yi, xi1] * (wy0 * wx1)[..., None]
            + img[yi1, xi] * (wy1 * wx0)[..., None]
            + img[yi1, xi1] * (wy1 * wx1)[..., None]
        )

    val = bilerp(depth[..., None])[..., 0]
    nrm = bilerp(normal)
    # grad-safe normalization (zero normals at invalid pixels would NaN
    # the pose-loss backward pass, train/finetune_pose.py)
    nrm = nrm / jnp.sqrt(jnp.sum(nrm * nrm, axis=-1, keepdims=True) + 1e-24)

    face = (x // H).astype(jnp.int32)
    xstp = ((x - face * H) / H - 0.5) * 2.0
    ystp = (0.5 - y / H) * 2.0
    cam = jnp.stack([xstp * val, ystp * val, -val], axis=-1)
    R_this = rots[face]  # [N, 3, 3]
    pc = jnp.einsum("nij,nj->ni", R_this, cam, precision=_HP)
    return pc, nrm
