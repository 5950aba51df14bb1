"""TensorBoard metric/image writer.

Wraps tensorboardX the way the reference's drivers use it
(mainPanoCompletion2view.py:221, :743-758; utils/train_op.py:15-17):
scalar groups per step and image grids normalized per panel.
"""

from __future__ import annotations

import numpy as np


class MetricsWriter:
    def __init__(self, logdir: str):
        from tensorboardX import SummaryWriter

        self.tb = SummaryWriter(log_dir=logdir)

    def scalars(self, tag: str, values: dict, step: int):
        self.tb.add_scalars(tag, {k: float(v) for k, v in values.items()},
                            step)

    def scalar(self, tag: str, value, step: int):
        self.tb.add_scalar(tag, float(value), step)

    def image_grid(self, tag: str, images, step: int, normalize=True):
        """images: list/array of [H, W, C] float panels, stacked vertically
        (the reference's tboard_add_img, utils/train_op.py:15-17)."""
        imgs = [np.asarray(im, np.float32) for im in images]
        if normalize:
            imgs = [
                (im - im.min()) / (im.max() - im.min())
                if im.max() > im.min() else im
                for im in imgs
            ]
        grid = np.concatenate(imgs, axis=0)
        self.tb.add_image(tag, grid.transpose(2, 0, 1), step)

    def close(self):
        self.tb.close()
