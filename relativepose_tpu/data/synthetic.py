"""Synthetic RGB-D pano scenes with exact ground-truth relative poses.

The reference's datasets are external multi-GB downloads (README.md:24-28),
so tests, benchmarks, and the minimum end-to-end slice run on procedurally
generated scenes: a textured axis-aligned box room rendered into the same
4-face skybox panorama format the datasets use (160x640 rgb / depth /
normal / semantic), from two camera poses with a controlled amount of
view overlap.

Conventions match the reference exactly:
  * pose matrices are world->camera; the GT relative pose is
    R_tgt @ inv(R_src) (evaluation.py:173-176);
  * pano block j looks through FACE_ROTATIONS[FACE_ORDER[dataset][j]];
  * depth is the face-planar z (lift: (xs*z, ys*z, -z));
  * scannet panos bake in the kinect intrinsics divisors so
    `pano_to_pointcloud` recovers the true geometry;
  * normals are stored in the view's camera frame;
  * rgb is BGR in [0, 1] (cv2.imread convention, datasets/SUNCG.py:289).

Texture (v3) is designed so that scene *completion is learnable* AND
completion-based *matching is solvable*, like the real datasets the
reference trains on: a scene-level base color modulated by a fixed
per-surface shade, a position ramp linear in normalized world coordinates
(deterministic given the room geometry — see `_texture` for the round-4
measurements that motivated it), a smooth low-frequency field
(correlated over ~1.6 m), and a fine hashed voxel detail layer (DoG
corners).  v1 was a pure hash field (completion information-theoretically
impossible); v2 added the learnable base/low-freq layers but kept all
*localizing* texture stochastic, which capped completed-descriptor
matching regardless of training (docs/TRAINING.md round 4).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from relativepose_tpu import config

FACE = config.FACE
H, W = config.PANO_HEIGHT, config.PANO_WIDTH


@dataclasses.dataclass
class Occluder:
    """Interior clutter object (v4): a yaw-rotated box or a vertical
    cylinder.  Occluders break the empty-convex-room degeneracy flagged in
    round 4: they occlude walls (completion must reason about visibility)
    and — for rotated boxes / curved cylinder sides — contribute surface
    normals off the 6-direction axis lattice, so the solver's three
    angle-consistency filters (rpmodule.py:424-436) operate in a
    non-degenerate regime."""

    kind: str            # 'box' | 'cyl'
    center: np.ndarray   # [3] world position
    size: np.ndarray     # box: [3] local half extents; cyl: [r, half_h, r]
    yaw: float = 0.0     # box: rotation about +y
    shade: float = 1.0   # per-object brightness (like _SURF_SHADE)

    def bound_radius(self) -> float:
        return float(np.linalg.norm(self.size))


@dataclasses.dataclass
class Room:
    half_extent: np.ndarray  # [3] half sizes of the box room
    tex_scale: float = 2.5   # voxel texture frequency
    seed: int = 0
    # v4 knobs (defaults reproduce v3 scenes bit-for-bit)
    ramp_weight: float = 0.35       # position-ramp texture coefficient
    clutter: tuple = ()             # tuple[Occluder, ...]


def _hash_color(ip, seed):
    """Deterministic pseudo-random color per integer 3D cell."""
    h = (ip[..., 0] * 73856093 ^ ip[..., 1] * 19349663
         ^ ip[..., 2] * 83492791 ^ (seed * 2654435761)) & 0x7FFFFFFF
    r = ((h >> 0) & 255) / 255.0
    g = ((h >> 8) & 255) / 255.0
    b = ((h >> 16) & 255) / 255.0
    return np.stack([b, g, r], axis=-1)  # BGR


def _smooth_noise(p_world, seed, freq: float = 0.6):
    """Trilinearly interpolated coarse hash field — smooth over ~1/freq m,
    so nearby points are correlated (extrapolation is learnable)."""
    q = p_world * freq
    q0 = np.floor(q).astype(np.int64)
    f = q - q0
    f = f * f * (3.0 - 2.0 * f)  # smoothstep weights
    out = np.zeros(p_world.shape[:-1] + (3,), np.float64)
    for dx in (0, 1):
        wx = f[..., 0] if dx else 1.0 - f[..., 0]
        for dy in (0, 1):
            wy = f[..., 1] if dy else 1.0 - f[..., 1]
            for dz in (0, 1):
                wz = f[..., 2] if dz else 1.0 - f[..., 2]
                corner = q0 + np.array([dx, dy, dz])
                out += (wx * wy * wz)[..., None] * _hash_color(corner, seed)
    return out


# Fixed per-surface brightness (surface id = axis*2 + (sign>0)): floor dark,
# ceiling bright, walls in between — deterministic, so a net that knows the
# geometry (normals/depth) and the scene color can predict every surface.
_SURF_SHADE = np.array([0.95, 0.80, 0.55, 1.15, 0.70, 1.05])


TEXTURE_VERSION = 3


def _texture(p_world, room: Room, surface=None, detail_seed=None,
             lowfreq_seed=None, shade=None):
    """v3 completion-learnable texture (see module docstring).

    Layers, by cross-view consistency and predictability-at-range:
      * base color x per-surface shade — scene-level, predictable;
      * POSITION RAMP (v3): an rgb ramp linear in normalized world
        position p / (2*half_extent).  Deterministic given the room
        GEOMETRY alone, so a completion net that hallucinates geometry
        can predict it exactly — and it is globally localizing (every
        point of a flat wall gets a unique color).  Round 4 measured why
        this is needed: with only stochastic texture layers, netF
        descriptors are perfectly cross-view matchable (ranking 0.0014)
        but SCNet cannot predict them far from the observed boundary
        (completed-feature ranking 0.05 vs the ~0.022 usability bound) —
        the information simply is not in the observation.  Real indoor
        scenes carry exactly this kind of predictable, localizing
        structure (furniture, openings, trim); v3 restores it to the
        synthetic family.
      * low-frequency smooth noise — scene-level, correlated over
        ~1.6 m: extrapolatable near the boundary only;
      * fine hash detail — uncorrelated voxel noise (DoG corners).

    detail_seed / lowfreq_seed override the fine / low-frequency layer
    seeds; rendering the two views of a TRAINING pair with different
    seeds decorrelates the stochastic layers across views, which forces
    contrastively-trained descriptors onto the predictable cues above
    (evaluation scenes keep scene-consistent seeds)."""
    rng = np.random.RandomState(room.seed * 977 + 11)
    scene_rgb = rng.uniform(0.3, 0.75, 3)
    if shade is not None:  # explicit per-point brightness (v4 trace path)
        base = scene_rgb[None, :] * np.asarray(shade)[..., None]
    elif surface is None:
        base = np.broadcast_to(scene_rgb, p_world.shape[:-1] + (3,))
    else:
        base = scene_rgb[None, :] * _SURF_SHADE[surface][..., None]
    ramp = p_world / (2.0 * room.half_extent[None, :]) + 0.5  # [0,1]^3
    low = _smooth_noise(
        p_world, room.seed + 2 if lowfreq_seed is None else lowfreq_seed)
    fine = _hash_color(
        np.floor(p_world * room.tex_scale * 4).astype(np.int64),
        room.seed + 1 if detail_seed is None else detail_seed)
    return np.clip(base + room.ramp_weight * (ramp - 0.5)
                   + 0.22 * (low - 0.5) + 0.22 * (fine - 0.5), 0.0, 1.0)


_WALL_SEMANTICS = {0: 1, 1: 2, 2: 1}  # axis -> class (wall/floor-ceiling)


def _ray_box(o, d, half):
    """Inner intersection of rays (o fixed, d [N, 3]) with box [-half, half].

    Returns (t [N], axis [N], sign [N]): exit parameter, hit axis, hit side.
    """
    with np.errstate(divide="ignore", invalid="ignore"):
        t_hi = (half[None, :] - o[None, :]) / d
        t_lo = (-half[None, :] - o[None, :]) / d
        t_exit_per_axis = np.where(d > 0, t_hi, np.where(d < 0, t_lo, np.inf))
    axis = np.argmin(t_exit_per_axis, axis=1)
    t = t_exit_per_axis[np.arange(len(axis)), axis]
    sign = np.sign(d[np.arange(len(axis)), axis])
    return t, axis, sign


def _yaw_mat(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def _ray_occluder(o, d, obj: Occluder):
    """First entry hit of rays (o [3], d [N, 3]) with an occluder seen from
    OUTSIDE.  Returns (t [N] — np.inf on miss, n_world [N, 3])."""
    n_rays = d.shape[0]
    if obj.kind == "box":
        Rm = _yaw_mat(obj.yaw)
        o_l = Rm.T @ (o - obj.center)
        d_l = d @ Rm  # row-vectors: (Rm.T @ d_i)^T
        d_safe = np.where(np.abs(d_l) < 1e-12, 1e-12, d_l)
        t0 = (-obj.size[None, :] - o_l[None, :]) / d_safe
        t1 = (obj.size[None, :] - o_l[None, :]) / d_safe
        tn = np.minimum(t0, t1)
        tf = np.maximum(t0, t1)
        axis = np.argmax(tn, axis=1)
        t_entry = tn[np.arange(n_rays), axis]
        t_far = np.min(tf, axis=1)
        hit = (t_far >= t_entry) & (t_entry > 1e-6)
        n_l = np.zeros((n_rays, 3))
        n_l[np.arange(n_rays), axis] = -np.sign(
            d_l[np.arange(n_rays), axis])
        return np.where(hit, t_entry, np.inf), n_l @ Rm.T
    # vertical cylinder: curved side + flat caps
    r, hh = obj.size[0], obj.size[1]
    o_l = o - obj.center
    a = d[:, 0] ** 2 + d[:, 2] ** 2
    b = 2.0 * (o_l[0] * d[:, 0] + o_l[2] * d[:, 2])
    c = o_l[0] ** 2 + o_l[2] ** 2 - r * r
    disc = b * b - 4.0 * a * c
    sq = np.sqrt(np.maximum(disc, 0.0))
    t_side = (-b - sq) / np.maximum(2.0 * a, 1e-12)
    y_side = o_l[1] + t_side * d[:, 1]
    side_ok = (disc > 0) & (t_side > 1e-6) & (np.abs(y_side) <= hh)
    dy = np.where(np.abs(d[:, 1]) < 1e-12, 1e-12, d[:, 1])
    t_cap = (np.where(d[:, 1] > 0, -hh, hh) - o_l[1]) / dy  # near cap
    cx = o_l[0] + t_cap * d[:, 0]
    cz = o_l[2] + t_cap * d[:, 2]
    cap_ok = (t_cap > 1e-6) & (cx * cx + cz * cz <= r * r)
    t_s = np.where(side_ok, t_side, np.inf)
    t_c = np.where(cap_ok, t_cap, np.inf)
    use_cap = t_c < t_s
    t = np.where(use_cap, t_c, t_s)
    # radial side normal at the hit point (bounded t: missed rays carry
    # t=inf and their normals are never consumed)
    p = o_l[None, :] + np.where(np.isfinite(t), t, 0.0)[:, None] * d
    n_side = np.stack([p[:, 0], np.zeros(n_rays), p[:, 2]], -1)
    n_side = n_side / np.maximum(
        np.linalg.norm(n_side, axis=-1, keepdims=True), 1e-12)
    n_cap = np.zeros((n_rays, 3))
    n_cap[:, 1] = -np.sign(d[:, 1])
    return t, np.where(use_cap[:, None], n_cap, n_side)


# semantic classes: 1/2 walls+floor (v3), 3 box furniture, 4 cylinders
_CLUTTER_SEMANTICS = {"box": 3, "cyl": 4}


def _trace_scene(cam, d_world, room: Room):
    """Nearest surface along each ray: room walls + all clutter.

    Returns (t [N], n_world [N, 3], shade [N], segm [N])."""
    t, axis, sign = _ray_box(cam, d_world, room.half_extent)
    n_rays = d_world.shape[0]
    n_world = np.zeros((n_rays, 3))
    n_world[np.arange(n_rays), axis] = -sign
    shade = _SURF_SHADE[2 * axis + (sign > 0)]
    segm = np.array([_WALL_SEMANTICS[a] for a in axis], np.int32)
    for obj in room.clutter:
        t_o, n_o = _ray_occluder(cam, d_world, obj)
        closer = t_o < t
        t = np.where(closer, t_o, t)
        n_world = np.where(closer[:, None], n_o, n_world)
        shade = np.where(closer, obj.shade, shade)
        segm = np.where(closer, _CLUTTER_SEMANTICS[obj.kind], segm)
    return t, n_world, shade, segm


def render_pano(room: Room, R_wc, t_wc, dataset: str, detail_seed=None,
                lowfreq_seed=None):
    """Render a skybox pano from the world->camera pose (R_wc, t_wc).

    Returns dict(rgb [H, W, 3] BGR 0..1, depth [H, W], norm [H, W, 3]
    camera-frame, segm [H, W] int).  Camera must be inside the room.
    """
    ds = config.canonical_dataset(dataset)
    # Host numpy constant — calling skybox.face_rotations here would
    # dispatch a tiny jnp op to the accelerator per rendered pano, which
    # over the axon tunnel costs seconds (it dominated make_pair).
    rots = config.FACE_ROTATIONS[list(config.FACE_ORDER[ds])].astype(
        np.float64)
    cam_center = -R_wc.T @ t_wc

    ys, xs = np.meshgrid(range(FACE), range(FACE), indexing="ij")
    ndc_x = (xs / FACE - 0.5) * 2.0
    ndc_y = (0.5 - ys / FACE) * 2.0
    if ds == "scannet":
        ndc_x = ndc_x / config.KINECT_FX_DIV
        ndc_y = ndc_y / config.KINECT_FY_DIV
    dirs_face = np.stack(
        [ndc_x, ndc_y, -np.ones_like(ndc_x)], axis=-1).reshape(-1, 3)

    rgb = np.zeros((H, W, 3), np.float32)
    depth = np.zeros((H, W), np.float32)
    norm = np.zeros((H, W, 3), np.float32)
    segm = np.zeros((H, W), np.int32)
    for j in range(4):
        d_view = dirs_face @ rots[j].T
        d_world = d_view @ R_wc  # R_wc^T @ d
        t, n_world, shade, seg = _trace_scene(cam_center, d_world, room)
        p_world = cam_center[None, :] + t[:, None] * d_world
        n_view = n_world @ R_wc.T  # R_wc @ n
        c = _texture(p_world, room, None, detail_seed, lowfreq_seed,
                     shade=shade)
        block = slice(j * FACE, (j + 1) * FACE)
        rgb[:, block] = c.reshape(FACE, FACE, 3)
        depth[:, block] = t.reshape(FACE, FACE)  # ray param == face z
        norm[:, block] = n_view.reshape(FACE, FACE, 3)
        segm[:, block] = seg.reshape(FACE, FACE)
    return dict(rgb=rgb, depth=depth, norm=norm, segm=segm)


def render_kinect_frame(room: Room, R_wc, t_wc, detail_seed=None,
                        lowfreq_seed=None):
    """Full-size 480x640 kinect frame (scannet's rgb_full/depth_full)."""
    h, w = config.KINECT_FULL_H, config.KINECT_FULL_W
    cam_center = -R_wc.T @ t_wc
    ys, xs = np.meshgrid(range(h), range(w), indexing="ij")
    ndc_x = (xs / w - 0.5) * 2.0 / config.KINECT_FX_DIV
    ndc_y = (0.5 - ys / h) * 2.0 / config.KINECT_FY_DIV
    dirs = np.stack([ndc_x, ndc_y, -np.ones_like(ndc_x)], -1).reshape(-1, 3)
    d_world = dirs @ R_wc
    t, _, shade, _ = _trace_scene(cam_center, d_world, room)
    p_world = cam_center[None, :] + t[:, None] * d_world
    rgb = _texture(p_world, room, None, detail_seed, lowfreq_seed,
                   shade=shade).reshape(h, w, 3).astype(np.float32)
    depth = t.reshape(h, w).astype(np.float32)
    return rgb, depth


def _yaw_pitch_rot(rng, max_pitch=0.15):
    yaw = rng.uniform(0, 2 * np.pi)
    pitch = rng.uniform(-max_pitch, max_pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    return (Ry @ Rx).astype(np.float64)


def _make_clutter(rng, room: Room, cam_centers, n_clutter: int) -> tuple:
    """Sample interior occluders that contain neither camera.

    Objects rest on the floor; boxes get a random yaw, cylinders a random
    radius/height.  A placement is rejected when a camera center is within
    the object's bounding sphere + 0.25 m (the camera must not be inside
    or nearly touching furniture)."""
    objs = []
    hx, hy, hz = room.half_extent
    for _ in range(n_clutter):
        for _attempt in range(20):
            kind = "box" if rng.rand() < 0.5 else "cyl"
            if kind == "box":
                size = rng.uniform(0.2, 0.55, 3)
                size[1] = rng.uniform(0.35, min(1.0, 1.6 * hy))
                yaw = rng.uniform(0.0, np.pi)
            else:
                r = rng.uniform(0.15, 0.4)
                size = np.array([r, rng.uniform(0.35, min(0.9, 1.6 * hy)),
                                 r])
                yaw = 0.0
            margin = float(np.max(size[[0, 2]])) + 0.05
            center = np.array([
                rng.uniform(-(hx - margin), hx - margin),
                -hy + size[1],  # resting on the floor
                rng.uniform(-(hz - margin), hz - margin)])
            obj = Occluder(kind=kind, center=center, size=size, yaw=yaw,
                           shade=rng.uniform(0.45, 1.25))
            if all(np.linalg.norm(c - center) > obj.bound_radius() + 0.25
                   for c in cam_centers):
                objs.append(obj)
                break
    return tuple(objs)


def make_pair(seed: int, dataset: str = "suncg", max_baseline: float = 0.8,
              max_yaw: float = np.pi, view_detail_jitter: bool = False,
              ramp_weight: float = 0.35, n_clutter: int = 0,
              full_frames: bool = True):
    """A synthetic pano pair + GT relative pose.

    Returns (data_s, data_t, T_gt [4,4]) where data_* have rgb/depth/norm/
    segm (+ rgb_full/depth_full for scannet) and 'pose' (world->cam 4x4);
    T_gt = pose_t @ inv(pose_s) maps src-camera points into the tgt camera
    frame (evaluation.py:173-176).

    v4 knobs (defaults keep v3 scenes byte-identical): `ramp_weight`
    scales the position-ramp texture layer (0.35 = v3; 0 = no globally
    localizing paint), `n_clutter` adds that many interior occluders
    (clutter uses an independent RNG stream so the room/poses/texture of
    a given seed are unchanged by it).

    full_frames=False skips the 480x640 kinect raycast for scannet
    (rgb_full/depth_full) — it is ~85% of scannet make_pair's cost and
    the training drivers never read those arrays (the device store drops
    them); only keypoint extraction at eval / pose-finetune needs them.
    """
    rng = np.random.RandomState(seed)
    room = Room(half_extent=rng.uniform(1.8, 3.2, 3), seed=seed,
                ramp_weight=ramp_weight)
    room.half_extent[1] = rng.uniform(1.2, 1.6)  # ceiling height

    poses = []
    for _ in range(2):
        R = _yaw_pitch_rot(rng)
        center = rng.uniform(-0.4, 0.4, 3) * room.half_extent
        center[1] = rng.uniform(-0.3, 0.1)
        t = -R @ center
        P = np.eye(4)
        P[:3, :3], P[:3, 3] = R, t
        poses.append(P)
    # pull the second camera toward the first for controllable baselines
    c0 = -poses[0][:3, :3].T @ poses[0][:3, 3]
    c1 = -poses[1][:3, :3].T @ poses[1][:3, 3]
    c1 = c0 + (c1 - c0) * min(1.0, max_baseline / (np.linalg.norm(c1 - c0)
                                                   + 1e-9))
    poses[1][:3, 3] = -poses[1][:3, :3] @ c1

    if n_clutter > 0:
        room.clutter = _make_clutter(
            np.random.RandomState(seed * 131 + 17), room, [c0, c1],
            n_clutter)

    views = []
    for vi, P in enumerate(poses):
        # per-view seeds for ALL stochastic texture layers (training
        # augmentation, see _texture)
        dseed = (room.seed * 31 + 7919 * (vi + 1)) if view_detail_jitter \
            else None
        lseed = (room.seed * 57 + 6037 * (vi + 1)) if view_detail_jitter \
            else None
        v = render_pano(room, P[:3, :3], P[:3, 3], dataset, dseed, lseed)
        v["pose"] = P
        if config.canonical_dataset(dataset) == "scannet" and full_frames:
            rgb_full, depth_full = render_kinect_frame(
                room, P[:3, :3], P[:3, 3], dseed, lseed)
            v["rgb_full"] = rgb_full
            v["depth_full"] = depth_full
        views.append(v)
    T_gt = poses[1] @ np.linalg.inv(poses[0])
    return views[0], views[1], T_gt
