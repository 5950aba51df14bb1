"""Experiment 2: where do the warp-splat's 21 ms go?

The raw scatter-max+gather pattern costs 7.7 ms at the same shapes
(splat_exp.py), yet the full splat stage measures 21.4 ms.  Suspects:
  a. vmap lowering of the scatter (production calls splat_to_pano through
     jax.vmap; splat_to_pano natively supports leading batch dims)
  b. the projection front-end (face einsum, argmax, take_along_axis)

Run: python tools/splat_exp2.py [--batch 8] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from relativepose_tpu.core import skybox
from relativepose_tpu import config


def timeit(fn, args, iters):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters


def frontend(points, valid, dataset):
    """splat_to_pano's projection math up to (flat, any_ok) — no scatter."""
    ds = config.canonical_dataset(dataset)
    rots = skybox.face_rotations(ds, dtype=points.dtype)
    H = config.FACE
    local = jnp.einsum("fji,...nj->...nfi", rots, points,
                       precision=jax.lax.Precision.HIGHEST)
    z = local[..., 2]
    denom = jnp.abs(z) + 1e-32
    x = local[..., 0] / denom
    y = local[..., 1] / denom
    ok = valid[..., None] & (z < 0) & (jnp.abs(x) < 1) & (jnp.abs(y) < 1)
    block = jnp.argmax(ok, axis=-1)
    any_ok = jnp.any(ok, axis=-1)
    bsel = block[..., None]
    xs = jnp.take_along_axis(x, bsel, axis=-1)[..., 0]
    ys = jnp.take_along_axis(y, bsel, axis=-1)[..., 0]
    zs = jnp.take_along_axis(z, bsel, axis=-1)[..., 0]
    u = jnp.clip(jnp.round((xs + 1.0) * 0.5 * H), 0, H - 1).astype(jnp.int32)
    v = jnp.clip(jnp.round((1.0 - ys) * 0.5 * H), 0, H - 1).astype(jnp.int32)
    u = u + block.astype(jnp.int32) * H
    M = H * 4 * H
    flat = jnp.where(any_ok, v * (4 * H) + u, M)
    return flat, zs


def main():
    import relativepose_tpu
    relativepose_tpu.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    B = args.batch
    N = 160 * 160

    rng = np.random.RandomState(0)
    # realistic geometry: points in front of the camera at ~2-5 m
    pts = rng.randn(B, N, 3) * 1.5
    pts[..., 2] -= 3.0
    pts_w = jnp.asarray(pts, jnp.float32)
    vals = jnp.asarray(rng.rand(B, N, 6), jnp.float32)
    valid = jnp.asarray(rng.rand(B, N) > 0.1)

    batched = jax.jit(
        lambda p, v, m: skybox.splat_to_pano(p, v, m, "suncg", 6))
    vmapped = jax.jit(jax.vmap(
        lambda p, v, m: skybox.splat_to_pano(p, v, m, "suncg", 6)))
    front = jax.jit(lambda p, m: frontend(p, m, "suncg"))

    for name, fn, a in [
        ("splat batched", batched, (pts_w, vals, valid)),
        ("splat vmapped", vmapped, (pts_w, vals, valid)),
        ("frontend only", front, (pts_w, valid)),
    ]:
        dt = timeit(fn, a, args.iters)
        print("%-14s %7.2f ms" % (name, 1e3 * dt))

    a = jax.tree_util.tree_map(np.asarray, batched(pts_w, vals, valid))
    b = jax.tree_util.tree_map(np.asarray, vmapped(pts_w, vals, valid))
    print("batched == vmapped:", all(
        np.allclose(x, y) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))))


if __name__ == "__main__":
    main()
