"""Stage-level microbenchmarks on the real chip.

Times individual pipeline stages with the N-call backpressure method
(docs/PERFORMANCE.md): enqueue N calls back-to-back, fetch ONE small
output at the end — steady-state per-call time, robust to the axon
tunnel's non-blocking block_until_ready.

Usage:  python tools/stage_bench.py [--batch 8] [--iters 20] [stages...]
Stages: build solve power keypoints blur warp affinity all
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


def timeit(fn, args, iters):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters


def main():
    import relativepose_tpu
    relativepose_tpu.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("stages", nargs="*", default=["all"])
    args = ap.parse_args()
    B = args.batch
    want = set(args.stages)

    def on(name):
        return "all" in want or name in want

    from relativepose_tpu.match import solver as S
    from relativepose_tpu.match.keypoints import (
        KeypointConfig, build_keypoint_sets, _blur, detect_dog)
    from relativepose_tpu.core import warp as W
    from relativepose_tpu import config

    rng = np.random.RandomState(0)
    kcfg = KeypointConfig()
    K = kcfg.capacity          # 344
    C = K * 5                  # 1720
    F = 32
    hp = S.SolverHyperParams()
    cfg = S.SolverStaticConfig()

    def rand_kpset(n):
        return dict(
            pc=jnp.asarray(rng.randn(n, K, 3), jnp.float32),
            normal=jnp.asarray(rng.randn(n, K, 3), jnp.float32),
            feat=jnp.asarray(rng.randn(n, K, F), jnp.float32),
            weight=jnp.ones((n, K)),
            valid=jnp.ones((n, K), bool),
        )

    ds, dt = rand_kpset(B), rand_kpset(B)

    if on("affinity"):
        @jax.jit
        def aff(ds, dt):
            return jax.vmap(
                lambda a, b, ws, wt, vs, vt: S.descriptor_affinity(
                    a / 100.0, b / 100.0, ws, wt, vs, vt, hp.sigma_feat)
            )(ds["feat"], dt["feat"], ds["weight"], dt["weight"],
              ds["valid"], dt["valid"])
        print("affinity      %7.2f ms" % (
            1e3 * timeit(aff, (ds, dt), args.iters)))

    # correspondence inputs for build/solve
    ps = jnp.asarray(rng.randn(B, C, 3), jnp.float32)
    pt = ps + 0.01 * jnp.asarray(rng.randn(B, C, 3), jnp.float32)
    ns = jnp.asarray(rng.randn(B, C, 3), jnp.float32)
    ns = ns / jnp.linalg.norm(ns, axis=-1, keepdims=True)
    nt = ns
    f = jnp.asarray(rng.rand(B, C), jnp.float32)
    obs = jnp.ones((B, C))
    cvalid = jnp.ones((B, C), bool)

    if on("build"):
        @jax.jit
        def build(ps, pt, ns, nt, f, obs, cvalid):
            return jax.vmap(lambda *a: S.pair_weight_matrix(*a, hp))(
                ps, pt, ns, nt, f, obs, cvalid)
        print("W build       %7.2f ms" % (1e3 * timeit(
            build, (ps, pt, ns, nt, f, obs, cvalid), args.iters)))

    Wmat, _ = jax.jit(lambda *a: jax.vmap(
        lambda *b: S.pair_weight_matrix(*b, hp))(*a))(
        ps, pt, ns, nt, f, obs, cvalid)
    Wmat = jax.block_until_ready(Wmat)

    if on("solve"):
        @jax.jit
        def solve(ps, pt, ns, nt, Wmat):
            return jax.vmap(
                lambda a, b, c, d, w: S.fit_irls_sm(a, b, c, d, w, hp.mu,
                                                    cfg))(ps, pt, ns, nt, Wmat)
        print("irls+sm solve %7.2f ms" % (1e3 * timeit(
            solve, (ps, pt, ns, nt, Wmat), args.iters)))

    if on("power"):
        h = jnp.asarray(rng.rand(B, C), jnp.float32)

        @jax.jit
        def power(Wmat, h):
            return jax.vmap(lambda w, hh: S._spectral_eigvec(w, hh, cfg))(
                Wmat, h)
        print("power x%d     %7.2f ms" % (cfg.power_iters, 1e3 * timeit(
            power, (Wmat, h), args.iters)))

    H, Wd = config.PANO_HEIGHT, config.PANO_WIDTH
    rgb = jnp.asarray(rng.rand(B, H, Wd, 3) * 255, jnp.float32)
    feat = jnp.asarray(rng.randn(B, H, Wd, F), jnp.float32)

    if on("keypoints"):
        @jax.jit
        def kps(rgb, feat, key):
            keys = jax.random.split(key, B)
            return jax.vmap(
                lambda r, ft, k: build_keypoint_sets(
                    r, r, ft, ft, k, kcfg))(rgb, feat, keys)
        print("keypoints     %7.2f ms" % (1e3 * timeit(
            kps, (rgb, feat, jax.random.PRNGKey(0)), args.iters)))

    if on("blur"):
        gray = rgb[..., 0]

        @jax.jit
        def blur4(gray):
            def one(g):
                obs = g[:, 160:320]
                return sum(_blur(obs, s) for s in (1.0, 1.6, 2.56, 4.1))
            return jax.vmap(one)(gray)
        print("blur x4       %7.2f ms" % (1e3 * timeit(
            blur4, (gray,), args.iters)))

        @jax.jit
        def det(gray):
            return jax.vmap(
                lambda g: detect_dog(g[:, 160:320], kcfg.n_detect))(gray)
        print("detect_dog    %7.2f ms" % (1e3 * timeit(
            det, (gray,), args.iters)))

    if on("keypoints"):
        from relativepose_tpu.match.keypoints import (
            augment_with_feature_matches)

        @jax.jit
        def aug(feat, key):
            keys = jax.random.split(key, B)
            q = jnp.asarray(rng.randn(B, 224, F), jnp.float32)
            v = jnp.ones((B, 224), bool)
            return jax.vmap(
                lambda qq, vv, ft, k: augment_with_feature_matches(
                    qq, vv, ft, k, 30))(q, v, feat, keys)
        print("aug matches   %7.2f ms" % (1e3 * timeit(
            aug, (feat, jax.random.PRNGKey(0)), args.iters)))

    if on("scnet"):
        from relativepose_tpu.models import SCNet
        from relativepose_tpu.models.blocks import resize_bilinear
        net = SCNet(output_type="rgbdnsf", snumclass=15, feature_dim=F,
                    dtype=jnp.bfloat16)
        xin = jnp.asarray(rng.rand(2 * B, H, Wd, 16), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), xin[:2])["params"]

        @jax.jit
        def scnet(params, xin):
            return net.apply({"params": params},
                             xin.astype(jnp.bfloat16)).astype(jnp.float32)
        print("scnet fwd     %7.2f ms" % (1e3 * timeit(
            scnet, (params, xin), args.iters)))

        @jax.jit
        def resize_rt(xin):
            y = resize_bilinear(xin, (224, 224))
            return resize_bilinear(
                jnp.tile(y, (1, 1, 1, 3))[..., :54], (H, Wd))
        print("resize pair   %7.2f ms" % (1e3 * timeit(
            resize_rt, (xin,), args.iters)))

    if on("warp"):
        depth = jnp.asarray(1.0 + rng.rand(B, H, Wd, 1), jnp.float32)
        mask = jnp.ones((B, H, Wd, 1), jnp.float32)
        view = jnp.concatenate(
            [rgb / 255.0, feat[..., :3], depth, mask], -1)  # 8ch
        T = jnp.tile(jnp.eye(4)[None], (B, 1, 1)).at[:, 0, 3].add(0.05)

        @jax.jit
        def do_warp(view, T):
            return W.warp_view_batched(view, T, "suncg")
        print("warp          %7.2f ms" % (1e3 * timeit(
            do_warp, (view, T), args.iters)))

        from relativepose_tpu.core import skybox

        @jax.jit
        def lift_only(view, T):
            def one(v, t):
                pts, vals, valid = W._observed_points_and_values(v, "suncg")
                R, tr = t[:3, :3], t[:3, 3]
                pts_w = jnp.einsum("ni,ji->nj", pts, R) + tr
                return pts_w, vals, valid
            return jax.vmap(one)(view, T)
        print("warp lift     %7.2f ms" % (1e3 * timeit(
            lift_only, (view, T), args.iters)))

        pts_w, vals, valid = lift_only(view, T)
        vals7 = jnp.concatenate([vals, vals[..., :1]], -1)[..., :6]

        @jax.jit
        def splat_only(pts_w, vals, valid):
            return jax.vmap(
                lambda p, v, m: skybox.splat_to_pano(p, v, m, "suncg", 6))(
                pts_w, vals, valid)
        print("warp splat    %7.2f ms" % (1e3 * timeit(
            splat_only, (pts_w, vals7, valid), args.iters)))


if __name__ == "__main__":
    main()
