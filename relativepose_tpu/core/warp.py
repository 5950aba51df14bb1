"""Cross-view warping of a partial pano under a pose estimate, on device.

Re-implements `util.warping` (util.py:94-172): lift the observed region of a
view to 3D, transform by the current pose estimate, rotate the normals, and
forward-splat rgb/normal/depth back onto the 4-face pano of the other view.
The reference runs this per-pair on host numpy every recurrence step; here it
is a batched jittable op (the key to keeping the whole recurrent loop on
TPU).

View layout (NHWC): [..., 160, 640, 8] with channels
[rgb(3), normal(3), depth(1), valid_mask(1)] — same semantic layout as the
reference's NCHW views (rpmodule.py:599-612).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from relativepose_tpu import config
from relativepose_tpu.core import skybox

_HP = jax.lax.Precision.HIGHEST

FACE = config.FACE


def _observed_points_and_values(view, dataset: str):
    """Lift the observed region of one view [H, W, 8] to points + values.

    Returns (points [N, 3], values [N, 6] (rgb+normal), valid [N]).
    """
    ds = config.canonical_dataset(dataset)
    rgb = view[..., 0:3]
    nrm = view[..., 3:6]
    depth = view[..., 6]

    if ds in ("suncg", "matterport"):
        # observed region = the full second face (util.py:119-123, :136-140)
        block = slice(FACE, 2 * FACE)
        face_depth = depth[:, block]
        pts, valid = skybox.face_depth_to_pointcloud(face_depth, ds)
        vals = jnp.concatenate([rgb[:, block], nrm[:, block]], axis=-1)
        vals = vals.reshape(-1, 6)
    else:  # scannet: 66x88 kinect window (util.py:158-161)
        r0, r1 = config.KINECT_ROW0, config.KINECT_ROW1
        c0, c1 = config.KINECT_COL0, config.KINECT_COL1
        crop = depth[r0:r1, c0:c1]
        pts, valid = skybox.kinect_crop_to_pointcloud(crop)
        vals = jnp.concatenate(
            [rgb[r0:r1, c0:c1], nrm[r0:r1, c0:c1]], axis=-1
        ).reshape(-1, 6)
    return pts, vals, valid


def warp_view(view, T, dataset: str):
    """Warp one view through rigid transform T.

    view: [160, 640, 8]; T: [4, 4] (maps this view's camera frame into the
    other view's frame).  Returns [160, 640, 8]: splatted
    [rgb, rotated-normal, splat-depth, splat-mask].  If T is (exactly) the
    identity the result is all zeros, matching util.py:95-96.
    """
    pts, vals, valid = _observed_points_and_values(view, dataset)
    R, t = T[:3, :3], T[:3, 3]
    pts_w = jnp.einsum("ni,ji->nj", pts, R, precision=_HP) + t
    nrm_w = jnp.einsum("ni,ji->nj", vals[:, 3:6], R, precision=_HP)
    vals_w = jnp.concatenate([vals[:, 0:3], nrm_w], axis=-1)
    pano, depth = skybox.splat_to_pano(pts_w, vals_w, valid, dataset, 6)
    mask = (depth != 0).astype(view.dtype)
    out = jnp.concatenate([pano, depth[..., None], mask[..., None]], axis=-1)
    is_identity = jnp.all(jnp.abs(T - jnp.eye(4, dtype=T.dtype)) == 0)
    return jnp.where(is_identity, jnp.zeros_like(out), out)


warp_view_batched = jax.vmap(warp_view, in_axes=(0, 0, None))
