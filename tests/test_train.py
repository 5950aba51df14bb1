import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relativepose_tpu.data import pipeline as dpipe
from relativepose_tpu.data import synthetic
from relativepose_tpu.train import completion, feature, losses, mesh

# multi-minute CPU compiles of the train steps; `-m "not slow"` for a
# fast suite pass (VERDICT r1 weak #6)
pytestmark = pytest.mark.slow


def make_batch(n_pairs=1, dataset="suncg", feature_learning=True, seed=0):
    """Host-side synthetic batch -> device-side assembled training batch."""
    samples = []
    for i in range(n_pairs):
        ds, dt, _ = synthetic.make_pair(seed + i, dataset, max_baseline=0.4)
        rgb = jnp.stack([jnp.asarray(ds["rgb"]), jnp.asarray(dt["rgb"])])
        norm = jnp.stack([jnp.asarray(ds["norm"]), jnp.asarray(dt["norm"])])
        depth = jnp.stack([jnp.asarray(ds["depth"]), jnp.asarray(dt["depth"])])
        poses = jnp.stack([jnp.asarray(ds["pose"], jnp.float32),
                           jnp.asarray(dt["pose"], jnp.float32)])
        segm = jnp.stack([jnp.asarray(ds["segm"]), jnp.asarray(dt["segm"])])
        out = dpipe.assemble_pair_batch(
            rgb, norm, depth, poses, segm, jax.random.PRNGKey(seed + i),
            dataset, feature_learning)
        samples.append(out)
    return jax.tree.map(lambda *x: jnp.stack(x), *samples)


class TestDataPipeline:
    def test_dense_correspondences_are_correct(self):
        """Sampled correspondences must relate by the GT pose within the
        0.08 m threshold."""
        from relativepose_tpu.core import skybox
        ds, dt, T_gt = synthetic.make_pair(0, "suncg", max_baseline=0.3)
        out = dpipe.dense_correspondences(
            jnp.asarray(ds["depth"]), jnp.asarray(dt["depth"]),
            jnp.asarray(ds["pose"], jnp.float32),
            jnp.asarray(dt["pose"], jnp.float32),
            jax.random.PRNGKey(0), "suncg")
        assert int(out["valid"]) == 1
        # lift both sides at the returned pano coords and compare in world
        isrc = np.asarray(out["idx_src"])[:200]
        itgt = np.asarray(out["idx_tgt"])[:200]
        pc_s, _ = skybox.pano_to_pointcloud(jnp.asarray(ds["depth"]), "suncg")
        pc_t, _ = skybox.pano_to_pointcloud(jnp.asarray(dt["depth"]), "suncg")
        FACE = 160

        def flat(idx):
            face = idx[:, 0] // FACE
            return face * FACE * FACE + idx[:, 1] * FACE + idx[:, 0] % FACE

        ps = np.asarray(pc_s)[flat(isrc)]
        pt = np.asarray(pc_t)[flat(itgt)]
        ps_in_t = ps @ np.asarray(T_gt[:3, :3]).T + np.asarray(T_gt[:3, 3])
        d = np.linalg.norm(ps_in_t - pt, axis=1)
        assert np.median(d) < 0.08
        assert (d < 0.12).mean() > 0.9

    def test_dense_correspondences_invalid_when_no_overlap(self):
        ds, dt, _ = synthetic.make_pair(1, "suncg")
        far = jnp.asarray(dt["pose"], jnp.float32).at[:3, 3].add(
            jnp.asarray([100.0, 0, 0]))
        out = dpipe.dense_correspondences(
            jnp.asarray(ds["depth"]), jnp.asarray(dt["depth"]),
            jnp.asarray(ds["pose"], jnp.float32), far,
            jax.random.PRNGKey(0), "suncg")
        assert int(out["valid"]) == 0

    def test_dense_correspondences_dataset_protocol(self):
        """Per-dataset protocol (CORRES_PARAMS): scannet keeps 500 pairs,
        needs >= 200 matches, and queries the MASKED pano pc only
        (ScanNet.py:263-291); suncg keeps 2000/needs 500 over the full
        grid (SUNCG.py:315-341)."""
        from relativepose_tpu import config as rcfg
        ds, dt, _ = synthetic.make_pair(3, "scannet", max_baseline=0.2)
        # source observes only the kinect window (real scannet panos are
        # sparse); target keeps the full pano
        depth_s = np.zeros_like(np.asarray(ds["depth"]))
        r0, r1 = rcfg.KINECT_ROW0, rcfg.KINECT_ROW1
        c0, c1 = rcfg.KINECT_COL0, rcfg.KINECT_COL1
        depth_s[r0:r1, c0:c1] = np.asarray(ds["depth"])[r0:r1, c0:c1]
        args = (jnp.asarray(depth_s), jnp.asarray(dt["depth"]),
                jnp.asarray(ds["pose"], jnp.float32),
                jnp.asarray(dt["pose"], jnp.float32),
                jax.random.PRNGKey(0), "scannet")

        out = dpipe.dense_correspondences(*args)
        assert out["idx_src"].shape == (500, 2)  # scannet n_corres
        assert int(out["valid"]) == 1
        # masked queries: every sampled source index lies in the observed
        # (nonzero-depth) region
        isrc = np.asarray(out["idx_src"])
        assert ((isrc[:, 0] >= c0) & (isrc[:, 0] < c1)
                & (isrc[:, 1] >= r0) & (isrc[:, 1] < r1)).all()

        # with ~6% of the pano valid, 5000 uniform-grid queries yield only
        # ~280 matches: the masked-pc pool is what makes >= 500 reachable
        out_m = dpipe.dense_correspondences(*args, min_corres=500)
        out_u = dpipe.dense_correspondences(*args, min_corres=500,
                                            masked_queries=False)
        assert int(out_m["valid"]) == 1
        assert int(out_u["valid"]) == 0

        # suncg protocol keeps 2000
        ds2, dt2, _ = synthetic.make_pair(0, "suncg", max_baseline=0.3)
        out2 = dpipe.dense_correspondences(
            jnp.asarray(ds2["depth"]), jnp.asarray(dt2["depth"]),
            jnp.asarray(ds2["pose"], jnp.float32),
            jnp.asarray(dt2["pose"], jnp.float32),
            jax.random.PRNGKey(0), "suncg")
        assert out2["idx_src"].shape == (2000, 2)

    def test_reproj_augment_shapes_and_noise(self):
        ds, dt, _ = synthetic.make_pair(2, "suncg", max_baseline=0.3)
        view8 = jnp.concatenate(
            [jnp.asarray(ds["rgb"]), jnp.asarray(ds["norm"]),
             jnp.asarray(ds["depth"])[..., None],
             jnp.ones((160, 640, 1))], -1)
        out = dpipe.reproj_augment(
            view8, jnp.asarray(ds["pose"], jnp.float32),
            jnp.asarray(dt["pose"], jnp.float32),
            jax.random.PRNGKey(3), "suncg")
        assert out["view8"].shape == (160, 640, 8)
        assert out["box"].shape == (160, 640)
        # dr is a small rigid residual, not identity, not huge
        from relativepose_tpu.core.rotation import angular_distance
        ang = float(angular_distance(out["dr"][:3, :3], jnp.eye(3)))
        assert 0.0 <= ang < 60.0
        assert float(out["box"].max()) == 1.0

    def test_reproj_sources_observed_face_only(self):
        """Reproj lifts ONLY the observed region: face 1 for
        suncg/matterport (SUNCG.py:375-377 slices h*h:2*h*h,
        Matterport3D.py:284-288 lifts face 1 via depth2pc), the kinect
        crop for scannet (ScanNet.py:293-356).  Poison every
        non-observed pixel with rgb=1 and assert nothing splats red."""
        from relativepose_tpu import config as rcfg
        for family, obs_cols in (
                ("matterport", (rcfg.FACE, 2 * rcfg.FACE)),
                ("suncg", (rcfg.FACE, 2 * rcfg.FACE))):
            ds, dt, _ = synthetic.make_pair(5, family, max_baseline=0.3)
            rgb = np.zeros((160, 640, 3), np.float32)
            rgb[:, :obs_cols[0]] = 1.0
            rgb[:, obs_cols[1]:] = 1.0
            # observed face carries 0.5-gray so the splat itself is visible
            rgb[:, obs_cols[0]:obs_cols[1]] = 0.5
            view8 = jnp.concatenate(
                [jnp.asarray(rgb), jnp.asarray(ds["norm"]),
                 jnp.asarray(ds["depth"])[..., None],
                 jnp.ones((160, 640, 1))], -1)
            out = dpipe.reproj_augment(
                view8, jnp.asarray(ds["pose"], jnp.float32),
                jnp.asarray(dt["pose"], jnp.float32),
                jax.random.PRNGKey(0), family)
            warped_rgb = np.asarray(out["view8"][..., 0:3])
            mask = np.asarray(out["view8"][..., 7]) > 0
            assert mask.any(), family
            assert warped_rgb[mask].max() <= 0.5 + 1e-5, family


SMALL_F = dict(base_width=8)
SMALL_C = dict(ngf=8, base_width=8)


class TestFeatureTraining:
    def test_loss_decreases(self):
        cfg = feature.FeatureTrainConfig(**SMALL_F)
        state = feature.init_state(jax.random.PRNGKey(0), cfg)
        step = jax.jit(feature.make_train_step(cfg))
        batch = make_batch(1)
        ls = []
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(i))
            ls.append(float(m["loss"]))
        assert np.isfinite(ls).all()
        assert ls[-1] < ls[0]

    def test_no_valid_corres_freezes_params(self):
        cfg = feature.FeatureTrainConfig(**SMALL_F)
        state = feature.init_state(jax.random.PRNGKey(0), cfg)
        step = jax.jit(feature.make_train_step(cfg))
        batch = make_batch(1)
        batch["denseCorres"]["valid"] = jnp.zeros_like(
            batch["denseCorres"]["valid"])
        p0 = jax.tree.leaves(state["params"])[0].copy()
        state, _ = step(state, batch, jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(state["params"])[0]),
            np.asarray(p0), atol=1e-8)


class TestCompletionTraining:
    def test_loss_decreases(self):
        cfg = completion.CompletionTrainConfig(**SMALL_C)
        state = completion.init_state(jax.random.PRNGKey(0), cfg)
        step = jax.jit(completion.make_train_step(cfg))
        batch = make_batch(1)
        ls = []
        for i in range(2):
            state, m = step(state, batch, jax.random.PRNGKey(i))
            ls.append(float(m["loss"]))
        assert np.isfinite(ls).all()
        assert ls[-1] < ls[0]
        assert float(m["loss_rgb"]) > 0
        assert float(m["loss_fc"]) >= 0

    def test_geow_and_dynamic_weight_paths(self):
        cfg = completion.CompletionTrainConfig(
            geometric_weight=True, dynamic_weighting=True, **SMALL_C)
        state = completion.init_state(jax.random.PRNGKey(0), cfg)
        step = jax.jit(completion.make_train_step(cfg))
        state, m = step(state, make_batch(1), jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))


class TestMeshSharding:
    def test_eight_device_mesh_available(self):
        assert len(jax.devices()) == 8

    def test_data_parallel_completion_step(self):
        m = mesh.make_mesh(8, model_parallel=1)
        cfg = completion.CompletionTrainConfig(feature_learning=False,
                                               **SMALL_C)
        state = completion.init_state(jax.random.PRNGKey(0), cfg)
        state = mesh.shard_train_state(state, m, tensor_parallel=False)
        batch = make_batch(4, feature_learning=False)
        # pad pair axis 4 -> 8 so it divides the data axis
        batch = jax.tree.map(
            lambda x: jnp.concatenate([x, x], 0), batch)
        batch = mesh.shard_batch(batch, m)
        step = jax.jit(completion.make_train_step(cfg))
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

    def test_tensor_parallel_state_sharding(self):
        m = mesh.make_mesh(8, model_parallel=4)
        cfg = completion.CompletionTrainConfig(feature_learning=False,
                                               ngf=16, base_width=8)
        state = completion.init_state(jax.random.PRNGKey(0), cfg)
        state = mesh.shard_train_state(state, m, tensor_parallel=True)
        # at least one large kernel must actually be sharded over 'model'
        sharded = [
            x for x in jax.tree.leaves(state["params"])
            if hasattr(x, "sharding") and "model" in str(x.sharding.spec)]
        assert sharded, "no parameter was tensor-sharded"
        batch = make_batch(2, feature_learning=False)
        batch = mesh.shard_batch(batch, m)
        step = jax.jit(completion.make_train_step(cfg))
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))


class TestLossUnits:
    def test_contrastive_loss_pulls_matches(self):
        key = jax.random.PRNGKey(0)
        feat = jax.random.normal(key, (1, 32, 64, 8))
        idx = jnp.stack(
            [jax.random.randint(key, (1, 50), 0, 64),
             jax.random.randint(key, (1, 50), 0, 32)], -1)
        dense = {"idx_src": idx, "idx_tgt": idx,
                 "valid": jnp.ones((1,), jnp.int32)}
        loss, pos, neg = losses.contrastive_loss(feat, feat, dense, key)
        assert float(pos) == 0.0  # identical features at matches
        assert float(neg) > 0.0

    def test_masked_l1_respects_weight(self):
        a = jnp.ones((1, 4, 4, 3))
        b = jnp.zeros((1, 4, 4, 3))
        w = jnp.zeros((1, 4, 4, 1))
        assert float(losses.masked_l1(a, b, w)) == 0.0
        assert float(losses.masked_l1(a, b, jnp.ones_like(w))) == 1.0

    def test_weighted_ce_perfect_prediction_small(self):
        logits = jnp.full((1, 4, 4, 3), -10.0).at[..., 1].set(10.0)
        labels = jnp.ones((1, 4, 4), jnp.int32)
        w = jnp.ones((1, 4, 4, 1))
        assert float(losses.weighted_ce(logits, labels, w)) < 1e-3

    def test_plane_normal_loss_zero_for_consistent(self):
        """For a camera at the box center looking at planes, depth derived
        from the plane equation equals the GT depth -> loss ~ 0."""
        ds, _, _ = synthetic.make_pair(4, "suncg")
        depth = jnp.asarray(ds["depth"])[None]
        nrm = jnp.asarray(ds["norm"])[None]
        # plane offset z s.t. intersecting the ray with the plane recovers
        # depth: pcPn = (z/(ray.n)) * ray must equal (xs*d, ys*d, -d),
        # whose ray-parameter is -d => z = -d * (ray . n)
        import numpy as np_
        F = 160
        ys, xs = np_.meshgrid(range(F), range(F), indexing="ij")
        xsn = ((xs / F - 0.5) * 2).astype(np_.float32)
        ysn = ((0.5 - ys / F) * 2).astype(np_.float32)
        from relativepose_tpu.core import skybox
        rots = np_.asarray(skybox.face_rotations("suncg"))
        plane = np_.zeros((160, 640), np_.float32)
        for j in range(4):
            blk = slice(j * F, (j + 1) * F)
            n_face = np_.asarray(ds["norm"][:, blk]).reshape(-1, 3) @ rots[j]
            ray = np_.stack([-xsn.ravel(), -ysn.ravel(),
                             np_.ones(F * F, np_.float32)], 1)
            dot = (ray * n_face).sum(1).reshape(F, F)
            plane[:, blk] = -ds["depth"][:, blk] * dot
        loss = losses.plane_normal_loss(depth, nrm, jnp.asarray(plane)[None],
                                        "suncg")
        assert float(loss) < 5e-3
