"""Experiment: alternative lowering strategies for the pano splat scatter.

The warp's forward splat (core/skybox.py::splat_to_pano) scatters ~25600
rows x 7 f32 channels per view into a 102401-slot buffer; XLA lowers
.at[].set() with duplicate indices to a serialized scatter.  Candidates:

  a. baseline         .at[b, idx].set(vals)             (current)
  b. bf16 payload     same scatter, half the bytes
  c. maxidx+gather    scatter-max of the point INDEX (last-wins for free,
                      1 int32 channel instead of 7 f32), then gather the
                      payload rows back
  d. sort+searchsorted  sort keys, binary-search each output pixel
                      (scatter-free: sort + gathers only)

Run: python tools/splat_exp.py [--batch 8] [--iters 20]
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

M = 160 * 640
N = 160 * 160
C = 7


def timeit(fn, args, iters):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters


def scatter_set(flat, payload):
    b = jnp.arange(flat.shape[0])[:, None]
    buf = jnp.zeros((flat.shape[0], M + 1, C), payload.dtype)
    return buf.at[b, flat].set(payload)


def scatter_set_bf16(flat, payload):
    return scatter_set(flat, payload.astype(jnp.bfloat16))


def maxidx_gather(flat, payload):
    b = jnp.arange(flat.shape[0])[:, None]
    pos = jnp.broadcast_to(jnp.arange(N)[None, :], flat.shape)
    idxbuf = jnp.full((flat.shape[0], M + 1), -1, jnp.int32)
    idxbuf = idxbuf.at[b, flat].max(pos)
    hit = idxbuf >= 0
    sel = jnp.maximum(idxbuf, 0)
    out = jnp.take_along_axis(payload, sel[..., None], axis=1)
    return jnp.where(hit[..., None], out, 0.0)


def sort_search(flat, payload):
    # last-wins: sort by key, ties broken by original position (stable sort
    # keeps order, so the LAST duplicate is the last equal entry); for each
    # output pixel take the rightmost matching row via side='right' - 1.
    order = jnp.argsort(flat, axis=1, stable=True)
    skeys = jnp.take_along_axis(flat, order, axis=1)
    svals = jnp.take_along_axis(payload, order[..., None], axis=1)
    q = jnp.arange(M)

    def one(sk, sv):
        pos = jnp.searchsorted(sk, q, side="right") - 1
        hit = (pos >= 0) & (jnp.take(sk, jnp.maximum(pos, 0)) == q)
        out = sv[jnp.maximum(pos, 0)]
        return jnp.where(hit[:, None], out, 0.0)

    return jax.vmap(one)(skeys, svals)


def main():
    import relativepose_tpu
    relativepose_tpu.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--clustered", action="store_true",
                    help="use a spatially coherent index pattern (realistic "
                         "forward-splat footprint) instead of uniform random")
    args = ap.parse_args()
    B = args.batch

    rng = np.random.RandomState(0)
    if getattr(args, "clustered", False):
        # realistic splat pattern: a 160x160 face forward-projected lands on
        # spatially coherent pano pixels with many duplicates; emulate with
        # a jittered low-res grid (~4 points per hit pixel).
        side = int(np.sqrt(N))
        u = (np.repeat(np.arange(side), side) * 2.0
             + rng.randint(0, 3, N)) % 640
        v = (np.tile(np.arange(side), side) * 0.6
             + rng.randint(0, 2, N)) % 160
        fl = (v.astype(np.int64) * 640 + u.astype(np.int64)).astype(np.int32)
        fl[rng.rand(N) < 0.2] = M  # invalid points -> trash slot
        flat = jnp.asarray(np.tile(fl, (B, 1)), jnp.int32)
    else:
        flat = jnp.asarray(rng.randint(0, M + 1, (B, N)), jnp.int32)
    payload = jnp.asarray(rng.rand(B, N, C), jnp.float32)

    fns = [("scatter set f32", jax.jit(scatter_set)),
           ("scatter set bf16", jax.jit(scatter_set_bf16)),
           ("maxidx+gather", jax.jit(maxidx_gather)),
           ("sort+searchsorted", jax.jit(sort_search))]
    for name, fn in fns:
        try:
            dt = timeit(fn, (flat, payload), args.iters)
            print("%-18s %7.2f ms" % (name, 1e3 * dt))
        except Exception as e:
            print("%-18s failed: %s" % (name, str(e)[:120]))

    # agreement check (ignoring duplicate-resolution differences: compare
    # only on pixels hit exactly once)
    a = np.asarray(scatter_set(flat[:1], payload[:1]))[:, :M]
    c = np.asarray(maxidx_gather(flat[:1], payload[:1]))[:, :M]
    d = np.asarray(sort_search(flat[:1], payload[:1]))[:, :M]
    counts = np.bincount(np.asarray(flat[0]), minlength=M + 1)[:M]
    once = counts == 1
    print("maxidx agree:", np.allclose(a[0][once], c[0][once]),
          "sort agree:", np.allclose(a[0][once], d[0][once]))


if __name__ == "__main__":
    main()
