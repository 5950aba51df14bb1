import jax.numpy as jnp
import numpy as np
import pytest

from relativepose_tpu import config
from relativepose_tpu.core import horn, masking, overlap, skybox, warp
from relativepose_tpu.core import rotation as rot
from relativepose_tpu.ops.interpolate import interpolate_normalized
from relativepose_tpu.ops.sampling import topk_nms

FACE = config.FACE


def _random_room_depth(rng, lo=1.0, hi=4.0):
    """Smoothish positive depth pano [160, 640]."""
    d = rng.rand(10, 40) * (hi - lo) + lo
    d = np.kron(d, np.ones((16, 16)))
    return d.astype(np.float32)


def _interior_mask():
    """Pixels whose NDC is strictly inside (-1, 1).

    Row 0 (ys=+1) and the first column of each face (xs=-1) sit exactly on
    the face boundary; the reference's splat drops them too
    (util.py:548: strict |x|<1, |y|<1).
    """
    m = np.ones((FACE, 4 * FACE), bool)
    m[0, :] = False
    m[:, [0, FACE, 2 * FACE, 3 * FACE]] = False
    return m


class TestSkyboxRoundTrips:
    @pytest.mark.parametrize("dataset", ["suncg", "matterport"])
    def test_pano_pointcloud_resplat_depth(self, rng, dataset):
        """pano depth -> points -> splat back must reproduce the depth map.

        Every pano pixel's ray intersects its own face at the same pixel, so
        the round trip is exact up to float rounding.  (Scannet is excluded:
        the reference's lift applies kinect intrinsics divisors that its
        splat does not invert — see test_scannet_resplat_contraction.)
        """
        depth = _random_room_depth(rng)
        pts, valid = skybox.pano_to_pointcloud(jnp.asarray(depth), dataset)
        vals = jnp.zeros((pts.shape[0], 1))
        _, d2 = skybox.splat_to_pano(pts, vals, valid, dataset, 1)
        m = _interior_mask()
        np.testing.assert_allclose(
            np.asarray(d2)[m], depth[m], rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("dataset", ["suncg", "matterport"])
    def test_pano_pointcloud_resplat_values(self, rng, dataset):
        depth = _random_room_depth(rng)
        colors = rng.rand(FACE, 4 * FACE, 3).astype(np.float32)
        pts, valid = skybox.pano_to_pointcloud(jnp.asarray(depth), dataset)
        # point order is face-major (like the reference's Pano2PointCloud)
        vals = jnp.asarray(np.concatenate(
            [colors[:, i * FACE : (i + 1) * FACE].reshape(-1, 3)
             for i in range(4)]))
        pano, _ = skybox.splat_to_pano(pts, vals, valid, dataset, 3)
        m = _interior_mask()
        np.testing.assert_allclose(np.asarray(pano)[m], colors[m], atol=1e-4)

    def test_scannet_resplat_contraction(self, rng):
        """Scannet lift divides NDC by the kinect intrinsics factors
        (util.py:806) while the splat uses plain skybox projection
        (util.py:679-748), so a lifted pixel re-splats at contracted NDC
        coords x/1.784, y/2.379 with the same depth."""
        depth = np.full((FACE, 4 * FACE), 2.5, np.float32)
        pts, valid = skybox.pano_to_pointcloud(jnp.asarray(depth), "scannet")
        vals = jnp.zeros((pts.shape[0], 1))
        _, d2 = skybox.splat_to_pano(pts, vals, valid, "scannet", 1)
        d2 = np.asarray(d2)
        from relativepose_tpu import config
        # pixel (x=40, y=80) of pano block 1 -> same block (scannet block 1
        # is the identity face), contracted
        x, y = FACE + 40, 80
        ndc_x = ((x - FACE) / FACE - 0.5) * 2 / config.KINECT_FX_DIV
        ndc_y = (0.5 - y / FACE) * 2 / config.KINECT_FY_DIV
        u = int(np.round((ndc_x + 1) * 0.5 * FACE)) + FACE
        v = int(np.round((1 - ndc_y) * 0.5 * FACE))
        assert d2[v, u] == pytest.approx(2.5, rel=1e-4)
        # contracted image occupies a centered sub-window of each face
        assert d2[80, FACE + 80] > 0  # center filled
        assert d2[80, FACE + 2] == 0  # face edge empty

    def test_face_order_differs_between_datasets(self, rng):
        depth = _random_room_depth(rng)
        p_s, _ = skybox.pano_to_pointcloud(jnp.asarray(depth), "suncg")
        p_m, _ = skybox.pano_to_pointcloud(jnp.asarray(depth), "matterport")
        assert not np.allclose(np.asarray(p_s), np.asarray(p_m))
        # block 1 of suncg (Rs[1]) == block 1 of matterport pano is Rs[0]:
        # matterport block 1 should equal raw camera coords
        f = FACE * FACE
        block1_m = np.asarray(p_m)[f : 2 * f]
        d1 = depth[:, FACE : 2 * FACE].reshape(-1)
        np.testing.assert_allclose(block1_m[:, 2], -d1, atol=1e-5)

    def test_pano_idx(self):
        idx = jnp.asarray([0, 1, FACE, FACE * FACE, FACE * FACE + 5])
        out = np.asarray(skybox.pano_idx(idx))
        # flat index inside a face is row-major over [h, h]=[160,160]:
        # unravel(rest, [160,160]) -> (ys, xs); reference then swaps.
        np.testing.assert_array_equal(out[0], [0, 0])
        np.testing.assert_array_equal(out[1], [1, 0])
        np.testing.assert_array_equal(out[2], [0, 1])
        np.testing.assert_array_equal(out[3], [FACE, 0])
        np.testing.assert_array_equal(out[4], [FACE + 5, 0])

    @pytest.mark.parametrize("dataset", ["suncg", "matterport"])
    def test_lift_keypoints_consistent_with_pointcloud(self, rng, dataset):
        depth = _random_room_depth(rng)
        # constant depth per 16px block, so bilinear interp inside a block is
        # exact; pick keypoint at block centers
        normal = rng.rand(FACE, 4 * FACE, 3).astype(np.float32) - 0.5
        pts_xy = np.stack(
            [rng.randint(0, 4 * FACE // 16, 50) * 16 + 4,
             rng.randint(0, FACE // 16, 50) * 16 + 4], 1
        ).astype(np.float32)
        pc, nrm = skybox.lift_keypoints(
            jnp.asarray(depth), jnp.asarray(normal), jnp.asarray(pts_xy), dataset
        )
        pc = np.asarray(pc)
        # compare against the full pano pointcloud at the same pixels
        all_pts, _ = skybox.pano_to_pointcloud(jnp.asarray(depth), dataset)
        all_pts = np.asarray(all_pts)
        for k in range(50):
            x, y = int(pts_xy[k, 0]), int(pts_xy[k, 1])
            face, xin = divmod(x, FACE)
            flat = face * FACE * FACE + y * FACE + xin
            np.testing.assert_allclose(pc[k], all_pts[flat], atol=1e-3)

    def test_normals_normalized_in_lift(self, rng):
        depth = _random_room_depth(rng)
        normal = rng.rand(FACE, 4 * FACE, 3).astype(np.float32) + 0.1
        pts = np.array([[200.5, 80.5], [300.2, 40.7]], dtype=np.float32)
        _, nrm = skybox.lift_keypoints(
            jnp.asarray(depth), jnp.asarray(normal), jnp.asarray(pts), "suncg")
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(nrm), axis=-1), 1.0, atol=1e-5)


class TestMasking:
    def test_second_mask_geometry(self):
        mask, geow = masking.observation_mask("second")
        mask = np.asarray(mask)
        geow = np.asarray(geow)
        assert mask[:, FACE : 2 * FACE].min() == 1
        assert mask[:, : FACE].max() == 0
        assert geow[:, FACE : 2 * FACE].max() == 0
        # weight decays with distance from the observed-face boundary
        assert geow[0, 2 * FACE] > geow[0, 3 * FACE - 1]
        # wrap-around: column 0 is adjacent to the face across the seam
        assert geow[0, 0] > geow[0, 4 * FACE - 1] * 0.9

    def test_kinect_mask_window(self):
        mask, geow_eval = masking.observation_mask("kinect", "eval")
        mask = np.asarray(mask)
        assert mask.sum() == config.KINECT_FOV_W * config.KINECT_FOV_H
        assert mask[80, 240] == 1
        assert mask[0, 0] == 0
        np.testing.assert_allclose(np.asarray(geow_eval), 1.0 - mask)
        _, geow_tr = masking.observation_mask("kinect", "train")
        geow_tr = np.asarray(geow_tr)
        assert geow_tr[80, 240] == 20.0 and geow_tr[0, 0] == 1.0

    def test_apply_mask_batched(self, rng):
        x = jnp.asarray(rng.rand(2, FACE, 4 * FACE, 8).astype(np.float32))
        masked, mask, geow = masking.apply_mask(x, "second")
        assert masked.shape == x.shape
        assert mask.shape == (2, FACE, 4 * FACE, 1)
        assert np.asarray(masked)[:, :, :FACE].max() == 0


class TestHorn:
    def test_exact_recovery(self, rng):
        from scipy.spatial.transform import Rotation as ScipyRot
        R_gt = ScipyRot.random(8, random_state=rng).as_matrix().astype(np.float32)
        t_gt = rng.randn(8, 3).astype(np.float32)
        src = rng.randn(8, 50, 3).astype(np.float32)
        nrm = rng.randn(8, 50, 3).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        tgt = np.einsum("bij,bnj->bni", R_gt, src) + t_gt[:, None]
        tnr = np.einsum("bij,bnj->bni", R_gt, nrm)
        w = np.abs(rng.rand(8, 50)).astype(np.float32) + 0.1
        R, t = horn.fit_rigid(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(nrm),
            jnp.asarray(tnr), jnp.asarray(w), jnp.asarray(w), 0.3)
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-3)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-3)

    def test_outliers_downweighted(self, rng):
        from scipy.spatial.transform import Rotation as ScipyRot
        R_gt = ScipyRot.random(1, random_state=rng).as_matrix()[0].astype(np.float32)
        src = rng.randn(100, 3).astype(np.float32)
        tgt = (src @ R_gt.T).astype(np.float32)
        tgt[:20] += rng.randn(20, 3) * 5  # corrupted
        w = np.ones(100, dtype=np.float32)
        w[:20] = 0.0
        nrm = np.zeros((100, 3), np.float32)
        R, t = horn.fit_rigid(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(nrm),
            jnp.asarray(nrm), jnp.asarray(w), jnp.asarray(w), 1.0)
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-3)

    def test_zero_weights_safe(self):
        src = jnp.zeros((10, 3))
        w = jnp.zeros((10,))
        R, t = horn.fit_rigid(src, src, src, src, w, w, 0.3)
        assert np.all(np.isfinite(np.asarray(R)))
        assert np.all(np.isfinite(np.asarray(t)))


class TestWarp:
    def test_identity_returns_zeros(self, rng):
        view = jnp.asarray(rng.rand(FACE, 4 * FACE, 8).astype(np.float32))
        out = warp.warp_view(view, jnp.eye(4), "suncg")
        assert np.asarray(out).max() == 0

    @pytest.mark.parametrize("dataset", ["suncg", "matterport", "scannet"])
    def test_warp_small_rotation_overlaps(self, rng, dataset):
        """Warping the observed region by a small rotation should land most
        points near the observed region of the pano."""
        depth = _random_room_depth(rng)
        view = np.zeros((FACE, 4 * FACE, 8), np.float32)
        view[..., 6] = depth
        view[..., 0:3] = rng.rand(FACE, 4 * FACE, 3)
        n = rng.randn(FACE, 4 * FACE, 3)
        view[..., 3:6] = n / np.linalg.norm(n, axis=-1, keepdims=True)
        view[..., 7] = 1.0
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(rot.ry(jnp.asarray(0.05)))
        out = np.asarray(warp.warp_view(jnp.asarray(view), jnp.asarray(T), dataset))
        mask = out[..., 7]
        assert mask.sum() > 100  # a healthy number of splatted pixels
        # splatted depth is positive where mask set
        assert (out[..., 6][mask > 0] > 0).all()

    def test_warp_roundtrip_pose(self, rng):
        """Warp by T then lift the splatted points: they should satisfy the
        rigid relation with the original observed points."""
        depth = _random_room_depth(rng)
        view = np.zeros((FACE, 4 * FACE, 8), np.float32)
        view[..., 6] = depth
        view[..., 7] = 1.0
        R = np.asarray(rot.rz(jnp.asarray(0.2)))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = [0.1, -0.05, 0.2]
        out = np.asarray(warp.warp_view(jnp.asarray(view), jnp.asarray(T), "suncg"))
        d_w = out[..., 6]
        pts_w, valid_w = skybox.pano_to_pointcloud(jnp.asarray(d_w), "suncg")
        pts_w = np.asarray(pts_w)[np.asarray(valid_w)]
        # original observed points, transformed
        pts0, valid0 = skybox.face_depth_to_pointcloud(
            jnp.asarray(depth[:, FACE : 2 * FACE]), "suncg")
        pts0 = np.asarray(pts0)[np.asarray(valid0)]
        pts0_t = pts0 @ R.T + T[:3, 3]
        # every splatted point must be close to SOME transformed source point
        from scipy.spatial import cKDTree
        tree = cKDTree(pts0_t)
        dd, _ = tree.query(pts_w, k=1)
        assert np.percentile(dd, 95) < 0.15


class TestOverlap:
    def test_full_overlap(self, rng):
        pts = rng.randn(500, 3).astype(np.float32)
        from scipy.spatial.transform import Rotation as ScipyRot
        R = ScipyRot.random(random_state=rng).as_matrix().astype(np.float32)
        t = rng.randn(3).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3], T[:3, 3] = R, t
        tgt = pts @ R.T + t
        valid = jnp.ones(500, bool)
        stats = overlap.point_cloud_overlap(
            jnp.asarray(pts), valid, jnp.asarray(tgt), valid, jnp.asarray(T))
        assert float(stats["overlap"]) == pytest.approx(1.0)
        assert float(stats["pc_nn"]) == pytest.approx(0.0, abs=1e-3)
        assert float(stats["cam_dist"]) == pytest.approx(np.linalg.norm(t), rel=1e-5)

    def test_zero_overlap(self, rng):
        a = rng.randn(300, 3).astype(np.float32)
        b = rng.randn(300, 3).astype(np.float32) + 100.0
        valid = jnp.ones(300, bool)
        stats = overlap.point_cloud_overlap(
            jnp.asarray(a), valid, jnp.asarray(b), valid, jnp.eye(4))
        assert float(stats["overlap"]) == 0.0

    def test_partial_overlap_with_masks(self, rng):
        a = rng.randn(400, 3).astype(np.float32)
        b = np.concatenate([a[:200], a[:200] + 50.0]).astype(np.float32)
        valid = jnp.ones(400, bool)
        stats = overlap.point_cloud_overlap(
            jnp.asarray(a), valid, jnp.asarray(b), valid, jnp.eye(4))
        assert 0.4 < float(stats["overlap"]) < 0.6


class TestOps:
    def test_interpolate_matches_manual(self, rng):
        feat = rng.rand(8, 16, 4).astype(np.float32)
        pts = np.array([[0.5, 0.5], [0.0, 0.0], [1.0, 1.0]], np.float32)
        out = np.asarray(interpolate_normalized(jnp.asarray(feat), jnp.asarray(pts)))
        np.testing.assert_allclose(out[1], feat[0, 0], atol=1e-6)
        np.testing.assert_allclose(out[2], feat[7, 15], atol=1e-6)
        x, y = 0.5 * 15, 0.5 * 7
        x0, y0 = int(x), int(y)
        wx, wy = x - x0, y - y0
        manual = (feat[y0, x0] * (1 - wx) * (1 - wy)
                  + feat[y0, x0 + 1] * wx * (1 - wy)
                  + feat[y0 + 1, x0] * (1 - wx) * wy
                  + feat[y0 + 1, x0 + 1] * wx * wy)
        np.testing.assert_allclose(out[0], manual, atol=1e-6)

    def test_topk_nms_picks_separated_minima(self):
        m = np.full((2, 64, 64), 10.0, np.float32)
        m[0, 10, 20] = 0.0
        m[0, 50, 55] = 0.1
        m[0, 11, 21] = 0.05  # within NMS window of the first -> suppressed
        m[1, 5, 5] = 0.0
        m[1, 40, 8] = 0.2
        pts = np.asarray(topk_nms(jnp.asarray(m), 2))
        assert (pts[0, 0] == [20, 10]).all()
        assert (pts[0, 1] == [55, 50]).all()
        assert (pts[1, 0] == [5, 5]).all()
        assert (pts[1, 1] == [8, 40]).all()
