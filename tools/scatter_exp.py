"""Microbenchmark: duplicate-resolving splat scatter variants on TPU.

The splat (core/skybox.py::splat_to_pano) resolves duplicate pano hits
with a batched scatter-max of the point index.  docs/PERFORMANCE.md:118
flagged that eval throughput *drops* from B=16 to B=32 and blamed the
splat scaling super-linearly; this tool times isolated variants so the
regression can be root-caused instead of guessed at:

  batched  - buf[B, M+1].at[b, idx].max(pos)   (current implementation)
  flat     - buf[B*(M+1)].at[b*(M+1)+idx].max(pos)  (1-D scatter)
  sortgather - stable-sort points by slot key, then one searchsorted
               gather per slot (scatter-free: winner = last entry of the
               key run, matching "highest point index wins")

Usage (real TPU):  python tools/scatter_exp.py --batch 8 16 32
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
N = 160 * 640


def sync(x):
    jax.device_get(jax.tree.leaves(x)[0][..., :1])


@jax.jit
def scatter_batched(flat, pos):
    B = flat.shape[0]
    buf = jnp.full((B, M + 1), -1, jnp.int32)
    b = jnp.arange(B)[:, None]
    return buf.at[b, flat].max(pos)[:, :M]


@jax.jit
def scatter_flat(flat, pos):
    B = flat.shape[0]
    buf = jnp.full((B * (M + 1),), -1, jnp.int32)
    gidx = (jnp.arange(B)[:, None] * (M + 1) + flat).reshape(-1)
    out = buf.at[gidx].max(pos.reshape(-1))
    return out.reshape(B, M + 1)[:, :M]


@jax.jit
def sortgather(flat, pos):
    # Stable sort by slot key; the winner of a duplicate run is the LAST
    # entry.  PRECONDITION: equals scatter-max of `pos` only because `pos`
    # is ascending within each row in this bench (arange).  Porting this
    # variant into splat_to_pano with non-monotonic pos would silently
    # change which duplicate wins — sort by a composite (slot, pos) key
    # there instead.
    order = jnp.argsort(flat, axis=-1, stable=True)
    key_sorted = jnp.take_along_axis(flat, order, -1)
    pos_sorted = jnp.take_along_axis(pos, order, -1)
    slots = jnp.arange(M, dtype=jnp.int32)

    def per_row(ks, ps):
        i = jnp.searchsorted(ks, slots, side="right") - 1
        hit = (i >= 0) & (jnp.take(ks, jnp.maximum(i, 0)) == slots)
        return jnp.where(hit, jnp.take(ps, jnp.maximum(i, 0)), -1)

    return jax.vmap(per_row)(key_sorted, pos_sorted)


def bench(fn, flat, pos, iters=20):
    out = fn(flat, pos)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(flat, pos)
    sync(out)
    return (time.time() - t0) / iters * 1e3


def main():
    import relativepose_tpu
    relativepose_tpu.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    for B in args.batch:
        # realistic index distribution: a projective resample (mostly
        # 1:1 with scattered duplicates + ~30% trash-slot misses)
        base = rng.permutation(M)[None, :].repeat(B, 0)
        jitter = rng.randint(-320, 320, size=(B, N))
        flat_np = np.clip(base + jitter, 0, M - 1)
        miss = rng.rand(B, N) < 0.3
        flat_np = np.where(miss, M, flat_np).astype(np.int32)
        flat = jnp.asarray(flat_np)
        pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        r = {}
        for name, fn in (("batched", scatter_batched),
                         ("flat", scatter_flat),
                         ("sortgather", sortgather)):
            ms = bench(fn, flat, pos, args.iters)
            r[name] = round(ms, 2)
        # agreement check (sortgather's winner rule == scatter-max)
        a = np.asarray(scatter_batched(flat, pos)[:, :M])
        c = np.asarray(sortgather(flat, pos))
        agree = float((a == c).mean())
        print({"B": B, "ms": r, "agree_sortgather": agree}, flush=True)


if __name__ == "__main__":
    main()
