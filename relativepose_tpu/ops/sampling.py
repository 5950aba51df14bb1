"""Fixed-shape argmax sampling with window non-max suppression.

Re-implements `Sampling` (rputil.py:355-371): given a per-query distance
heatmap over the pano, iteratively pick the best location and suppress a
15-px window around it, K times.  The reference loops in Python per heatmap;
here it is a `lax.fori_loop` batched over all queries at once.

Note the reference converts distance -> exp(-d/2) and argmaxes; argmax of
exp(-d/2) == argmin of d, so we argmin the distance map directly and
suppress by setting the window to +inf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

WINDOW = 15
_BIG = 1e30


def topk_nms(dist_maps, k: int, window: int = WINDOW):
    """dist_maps: [N, H, W] distance heatmaps -> [N, k, 2] (x, y) int coords.

    For each map, k rounds of (argmin, suppress (2*window)x(2*window) box).
    The reference suppresses the half-open box [c-w, c+w) clipped to the
    map (rputil.py:367-370).
    """
    n, h, w = dist_maps.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)

    def pick_and_box(maps_masked):
        flat_idx = jnp.argmin(maps_masked.reshape(n, -1), axis=-1)
        yy = (flat_idx // w).astype(jnp.int32)
        xx = (flat_idx % w).astype(jnp.int32)
        # suppress [y-window, y+window) x [x-window, x+window), clipped;
        # the reference clips the top-left at 0 and bottom-right at
        # (w-1, h-1)
        x0 = jnp.maximum(xx - window, 0)[:, None, None]
        y0 = jnp.maximum(yy - window, 0)[:, None, None]
        x1 = jnp.minimum(xx + window, w - 1)[:, None, None]
        y1 = jnp.minimum(yy + window, h - 1)[:, None, None]
        in_box = (
            (cols[None] >= x0) & (cols[None] < x1)
            & (rows[None] >= y0) & (rows[None] < y1)
        )
        return xx, yy, in_box

    if k <= 4:
        # Unrolled: keep a boolean suppression mask and let XLA fuse the
        # `where` into each argmin reduction — the fori_loop form below
        # materializes the full [N, H, W] masked maps as loop-carried
        # state every round (an extra read+write of ~36 MB per round at
        # the pipeline's 90-map batches).
        sup = jnp.zeros((n, h, w), bool)
        out = []
        for _ in range(k):
            xx, yy, in_box = pick_and_box(
                jnp.where(sup, _BIG, dist_maps))
            out.append(jnp.stack([xx, yy], -1))
            sup = sup | in_box
        return jnp.stack(out, axis=1)

    def body(i, carry):
        maps, pts = carry
        xx, yy, in_box = pick_and_box(maps)
        pts = pts.at[:, i, 0].set(xx)
        pts = pts.at[:, i, 1].set(yy)
        maps = jnp.where(in_box, _BIG, maps)
        return maps, pts

    pts0 = jnp.zeros((n, k, 2), dtype=jnp.int32)
    _, pts = jax.lax.fori_loop(0, k, body, (dist_maps, pts0))
    return pts
