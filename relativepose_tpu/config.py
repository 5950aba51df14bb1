"""Global constants: panorama geometry, per-dataset conventions, palettes.

Mirrors the reference's `config.py` (nViews / pano size / semantic palettes,
see /root/reference/config.py:3-82) and centralises the per-dataset geometry
conventions that are scattered through the reference (`util.py:468-523`,
`util.py:537-811`): skybox face rotations, face ordering, ScanNet kinect
intrinsics fudge factors, and observation-mask windows.
"""

from __future__ import annotations

import dataclasses

import numpy as np

N_VIEWS = 2
PANO_WIDTH = 640
PANO_HEIGHT = 160
FACE = 160  # each skybox face is FACE x FACE; PANO_WIDTH == 4 * FACE

# ---------------------------------------------------------------------------
# Skybox face rotations (camera-to-world for each of the 4 faces).
# Reference: util.py:539-543 (and repeated at :610-614, :680-684, :757-761).
# ---------------------------------------------------------------------------
FACE_ROTATIONS = np.stack(
    [
        np.eye(3),
        np.array([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]]),
        np.array([[-1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, -1.0]]),
        np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]]),
    ]
)

# Which rotation each pano column-block uses: block j of the pano maps through
# FACE_ROTATIONS[FACE_ORDER[dataset][j]].
#   suncg:               block j -> Rs[j]        (util.py:770)
#   matterport/scannet:  block j -> Rs[(j-1)%4]  (util.py:788, :808)
FACE_ORDER = {
    "suncg": (0, 1, 2, 3),
    "matterport": (3, 0, 1, 2),
    "scannet": (3, 0, 1, 2),
}

# ScanNet kinect-frustum conventions (util.py:499-521, :158; apply_mask
# 'kinect' at util.py:224-229).
KINECT_FULL_W = 640
KINECT_FULL_H = 480
KINECT_FOV_W = 88  # int(89.67 // 2) * 2
KINECT_FOV_H = 66  # int(67.25 // 2) * 2
# crop window inside the pano: rows 80 +/- 33, cols 160 + 80 +/- 44
KINECT_ROW0 = 80 - KINECT_FOV_H // 2
KINECT_ROW1 = 80 + KINECT_FOV_H // 2
KINECT_COL0 = FACE + 80 - KINECT_FOV_W // 2
KINECT_COL1 = FACE + 80 + KINECT_FOV_W // 2
# intrinsics divisors for full-size 480x640 depth (util.py:508-509)
KINECT_FX_DIV = 0.8921875 * 2
KINECT_FY_DIV = 1.1895 * 2

# Observation-mask geometric-weight sigma for maskMethod='second'
# (util.py:219-221).
SECOND_MASK_SIGMA = 0.7

# ---------------------------------------------------------------------------
# Semantic classes + palettes (config.py:8-82).
# ---------------------------------------------------------------------------
SUNCG_CATS = [
    "ceiling", "wall", "floor", "window", "bed", "door", "cabinet", "chair",
    "sofa", "television", "table", "object", "computer", "lamp", "curtain",
]
SUNCG_PALETTE = np.array(
    [
        (209, 97, 0), (4, 247, 87), (255, 181, 0), (0, 0, 53),
        (254, 255, 230), (163, 200, 201), (87, 83, 41), (48, 0, 24),
        (0, 137, 65), (0, 194, 160), (111, 0, 98), (82, 84, 163),
        (90, 0, 7), (107, 0, 44), (58, 36, 101),
    ]
)

MATTERPORT_CATS = [
    "unknown", "wall", "floor", "chair", "door", "table", "picture",
    "cabinet", "window", "sofa", "bed", "plant", "sink", "stairs", "ceiling",
    "toilet", "mirror", "bathtub", "counter", "railing", "shelving",
]
MATTERPORT_PALETTE = np.array(
    [
        (143, 176, 255), (4, 247, 87), (255, 181, 0), (48, 0, 24),
        (163, 200, 201), (111, 0, 98), (161, 194, 153), (55, 33, 1),
        (0, 0, 53), (0, 137, 65), (254, 255, 230), (79, 198, 1),
        (167, 117, 0), (128, 150, 147), (209, 97, 0), (122, 73, 0),
        (28, 230, 255), (255, 138, 154), (146, 35, 41), (255, 246, 159),
        (255, 47, 128),
    ]
)

SCANNET_CATS = [
    "unknown", "wall", "floor", "cabinet", "bed", "chair", "sofa", "table",
    "door", "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurn",
]
SCANNET_PALETTE = np.array(
    [
        (0, 0, 0), (174, 199, 232), (152, 223, 138), (31, 119, 180),
        (255, 187, 120), (188, 189, 34), (140, 86, 75), (255, 152, 150),
        (214, 39, 40), (197, 176, 213), (148, 103, 189), (196, 156, 148),
        (23, 190, 207), (247, 182, 210), (219, 219, 141), (255, 127, 14),
        (158, 218, 229), (44, 160, 44), (112, 128, 144), (227, 119, 194),
        (82, 84, 163),
    ]
)

PALETTES = {
    "suncg": SUNCG_PALETTE,
    "matterport": MATTERPORT_PALETTE,
    "scannet": SCANNET_PALETTE,
}

NUM_CLASSES = {"suncg": 15, "matterport": 21, "scannet": 21}


def canonical_dataset(name: str) -> str:
    """Map a data-list name ('suncgv3', 'matterport3dv1', ...) to its family."""
    for key in ("suncg", "matterport", "scannet"):
        if key in name:
            return key
    raise ValueError(f"unknown dataset: {name!r}")


def num_classes_for(name: str) -> int:
    # evaluation.py:75 — 15 for suncg, otherwise 21
    return NUM_CLASSES[canonical_dataset(name)]


# ---------------------------------------------------------------------------
# Output channel layout.
# The networks emit a channel-concatenated map whose layout is derived from an
# `outputType` string, mirroring mainFeatureLearning.py:126-158 /
# rpmodule.py:582-593.  Order is fixed: rgb(3), n(3), d(1), k(1),
# s(snumclass), f(featureDim).
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ChannelLayout:
    output_type: str
    snumclass: int = 15
    feature_dim: int = 32

    def _spans(self):
        spans = {}
        p = 0
        if "rgb" in self.output_type:
            spans["rgb"] = (p, p + 3)
            p += 3
        if "n" in self.output_type.replace("rgb", ""):
            spans["n"] = (p, p + 3)
            p += 3
        if "d" in self.output_type:
            spans["d"] = (p, p + 1)
            p += 1
        if "k" in self.output_type:
            spans["k"] = (p, p + 1)
            p += 1
        if "s" in self.output_type:
            spans["s"] = (p, p + self.snumclass)
            p += self.snumclass
        if "f" in self.output_type:
            spans["f"] = (p, p + self.feature_dim)
            p += self.feature_dim
        return spans, p

    @property
    def spans(self):
        return self._spans()[0]

    @property
    def num_output(self) -> int:
        return self._spans()[1]

    def slice_of(self, key: str):
        lo, hi = self.spans[key]
        return slice(lo, hi)
