"""Plot helpers rendered to numpy images (utils/plot.py:14-241).

Used for tensorboard panels and eval artifacts: series plots, histograms,
cumulative-error curves, and a matplotlib-figure -> HWC-uint8 converter.
Matplotlib runs headless (Agg).
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plt2npy(fig) -> np.ndarray:
    """Render a matplotlib figure to an RGB uint8 array (plot.py:225-232)."""
    fig.canvas.draw()
    buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    w, h = fig.canvas.get_width_height()
    img = buf.reshape(h, w, 4)[..., :3].copy()
    plt.close(fig)
    return img


def plot_series(series, labels=None, title="", xlabel="", ylabel=""):
    """Line plot(s) -> image (plot.py:14-37)."""
    fig, ax = plt.subplots(figsize=(6, 4), dpi=100)
    series = np.atleast_2d(np.asarray(series, dtype=float))
    for i, s in enumerate(series):
        ax.plot(s, label=labels[i] if labels else None)
    if labels:
        ax.legend()
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.grid(True, alpha=0.3)
    return plt2npy(fig)


def plot_histogram(values, bins=50, title="", xlabel=""):
    """Histogram -> image (plot.py:39-59)."""
    fig, ax = plt.subplots(figsize=(6, 4), dpi=100)
    ax.hist(np.asarray(values, dtype=float).ravel(), bins=bins)
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.grid(True, alpha=0.3)
    return plt2npy(fig)


def plot_cumulative(values_list, labels=None, title="", xlabel="error",
                    x_max=None):
    """Cumulative-error curve(s) -> image (plot.py:61-84) — the reference's
    per-epoch normal-angle / depth-L1 / descriptor-ratio eval artifact."""
    fig, ax = plt.subplots(figsize=(6, 4), dpi=100)
    if not isinstance(values_list, (list, tuple)):
        values_list = [values_list]
    for i, vals in enumerate(values_list):
        v = np.sort(np.asarray(vals, dtype=float).ravel())
        if len(v) == 0:
            continue
        y = np.arange(1, len(v) + 1) / len(v)
        ax.plot(v, y, label=labels[i] if labels else None)
    if labels:
        ax.legend()
    if x_max is not None:
        ax.set_xlim(0, x_max)
    ax.set_ylim(0, 1)
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.set_ylabel("fraction")
    ax.grid(True, alpha=0.3)
    return plt2npy(fig)


def plot_keypoints_3d(points, title=""):
    """Simple 3-D scatter of keypoints/voxels -> image (plot.py:87-223)."""
    fig = plt.figure(figsize=(5, 5), dpi=100)
    ax = fig.add_subplot(projection="3d")
    p = np.asarray(points, dtype=float).reshape(-1, 3)
    ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=2)
    ax.set_title(title)
    return plt2npy(fig)
