import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relativepose_tpu.eval import descriptor_eval
from relativepose_tpu.utils import img as img_utils
from relativepose_tpu.utils import plot as plot_utils
from relativepose_tpu.utils import torch_import, visualization


class TestPlot:
    def test_series_histogram_cumulative(self, rng):
        im1 = plot_utils.plot_series([rng.rand(20), rng.rand(20)],
                                     labels=["a", "b"], title="t")
        im2 = plot_utils.plot_histogram(rng.randn(500), title="h")
        im3 = plot_utils.plot_cumulative([rng.rand(100) * 90],
                                         labels=["rot"], x_max=90)
        for im in (im1, im2, im3):
            assert im.dtype == np.uint8 and im.ndim == 3 and im.shape[2] == 3
            assert im.std() > 0  # something was drawn

    def test_keypoints_3d(self, rng):
        im = plot_utils.plot_keypoints_3d(rng.randn(50, 3))
        assert im.dtype == np.uint8

    def test_voxels_both_modes(self, rng):
        vox = (rng.rand(8, 8, 8, 1) > 0.7).astype(np.float32)
        im1 = plot_utils.plot_voxels(vox, mode="fix_size")
        im2 = plot_utils.plot_voxels(rng.rand(8, 8, 8), mode="weighted")
        for im in (im1, im2):
            assert im.dtype == np.uint8 and im.std() > 0

    def test_keypoint_sets_align_recovers_shape(self, rng):
        # two copies of the same skeleton under different rigid poses
        # must coincide after align=True (visualize_keypoint 'align')
        base = rng.randn(3, 12)
        theta = 0.8
        R = np.array([[np.cos(theta), -np.sin(theta), 0],
                      [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
        kp = np.stack([base, R @ base + np.array([[1.0], [2.0], [-0.5]])])
        edges = [(0, 1), (1, 2), (2, 3)]
        im = plot_utils.plot_keypoint_sets(kp, edges=edges, align=True)
        assert im.dtype == np.uint8 and im.std() > 0
        im2 = plot_utils.plot_keypoint_sets(kp, edges=edges, align=False)
        assert im2.dtype == np.uint8

    def test_contour(self, rng):
        ys, xs = np.meshgrid(np.linspace(-1, 1, 40), np.linspace(-1, 1, 40),
                             indexing="ij")
        im = plot_utils.plot_contour(np.hypot(xs, ys), n_levels=10)
        assert im.dtype == np.uint8 and im.std() > 0


class TestImgUtils:
    def test_crop_center_identity(self, rng):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        out = img_utils.crop(img, (32, 32), 64, 0, 64)
        np.testing.assert_allclose(out, img, atol=2)

    def test_draw_gaussian_peak(self):
        hm = np.zeros((32, 32), np.float32)
        img_utils.draw_gaussian(hm, (10, 12), 2.0)
        assert hm[12, 10] == pytest.approx(1.0)
        assert hm[0, 0] == 0.0

    def test_transform_point_roundtrip(self):
        p = img_utils.transform_point((10, 20), (32, 32), 64, 0, 128)
        back = img_utils.transform_point(p, (32, 32), 64, 0, 128,
                                         invert=True)
        np.testing.assert_allclose(back, (10, 20), atol=1)


class TestVisualization:
    def test_draw_match(self, rng):
        img = (rng.rand(40, 80, 3) * 255).astype(np.uint8)
        src = np.array([[5, 5], [20, 10]])
        out = visualization.draw_match(img, img, src, src + 2)
        assert out.shape == (80, 80, 3)

    def test_colorize_semantics(self):
        lab = np.array([[0, 1], [2, 14]])
        out = visualization.colorize_semantics(lab, "suncg")
        assert out.shape == (2, 2, 3)
        np.testing.assert_array_equal(out[0, 0], (209, 97, 0))

    def test_pc2obj(self, tmp_path):
        path = os.path.join(tmp_path, "x.obj")
        visualization.pc2obj(path, np.ones((3, 5)))
        lines = open(path).read().strip().split("\n")
        assert len(lines) == 6 and lines[1].startswith("v ")


class TestTorchImport:
    def test_conv_roundtrip(self, rng):
        import torch

        w = rng.randn(8, 4, 3, 3).astype(np.float32)
        k = torch_import.convert_conv(w)
        assert k.shape == (3, 3, 4, 8)
        # flax conv with converted kernel == torch conv
        x = rng.randn(1, 10, 10, 4).astype(np.float32)
        y_flax = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        with torch.no_grad():
            conv = torch.nn.Conv2d(4, 8, 3, padding=1, bias=False)
            conv.weight.data = torch.from_numpy(w)
            y_t = conv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(y_flax), y_t.numpy().transpose(0, 2, 3, 1), atol=1e-4)

    def test_deconv_conversion_matches_torch(self, rng):
        import torch

        from relativepose_tpu.models.blocks import DeconvBlock

        w = rng.randn(4, 6, 4, 4).astype(np.float32)  # torch [I, O, kH, kW]
        x = rng.randn(1, 7, 7, 4).astype(np.float32)
        blk = DeconvBlock(6, 4, 2, 1, batchnorm=False, act=False)
        params = {"params": {"kernel": jnp.asarray(
            torch_import.convert_deconv(w)), "bias": jnp.zeros(6)}}
        y = np.asarray(blk.apply(params, jnp.asarray(x)))
        with torch.no_grad():
            tconv = torch.nn.ConvTranspose2d(4, 6, 4, 2, 1, bias=False)
            tconv.weight.data = torch.from_numpy(w)
            yt = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            y, yt.numpy().transpose(0, 2, 3, 1), atol=1e-4)

    def test_bn_conversion(self, rng):
        from relativepose_tpu.models.blocks import BatchNorm2d

        weight = rng.rand(3).astype(np.float32) + 0.5
        bias = rng.randn(3).astype(np.float32)
        scale, b = torch_import.convert_bn(weight, bias)
        x = rng.randn(4, 8, 8, 3).astype(np.float32) * 3 + 1
        bn = BatchNorm2d()
        y = np.asarray(bn.apply(
            {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(b)}},
            jnp.asarray(x)))
        import torch
        with torch.no_grad():
            tbn = torch.nn.BatchNorm2d(3, track_running_stats=False)
            tbn.weight.data = torch.from_numpy(weight)
            tbn.bias.data = torch.from_numpy(bias)
            tbn.train()
            yt = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            y, yt.numpy().transpose(0, 2, 3, 1), atol=1e-3)


class TestDescriptorEval:
    def test_perfect_descriptors_rank_zero(self, rng):
        """With a unique descriptor per location, the true match ranks
        first (ratio ~ 0)."""
        h, w, c = 16, 32, 8
        feat = rng.randn(1, h, w, c).astype(np.float32) * 5
        xs = rng.randint(0, w, (1, 40))
        ys = rng.randint(0, h, (1, 40))
        idx = np.stack([xs, ys], -1)
        dense_valid = jnp.ones((1,), jnp.int32)
        ratios, _ = descriptor_eval.ranking_ratio(
            jnp.asarray(feat), jnp.asarray(feat), jnp.asarray(idx),
            jnp.asarray(idx), dense_valid, sample=20)
        assert float(np.asarray(ratios).mean()) < 0.02

    def test_random_descriptors_rank_half(self, rng):
        h, w, c = 16, 32, 8
        fs = rng.randn(1, h, w, c).astype(np.float32)
        ft = rng.randn(1, h, w, c).astype(np.float32)
        idx = np.stack([rng.randint(0, w, (1, 40)),
                        rng.randint(0, h, (1, 40))], -1)
        ratios, _ = descriptor_eval.ranking_ratio(
            jnp.asarray(fs), jnp.asarray(ft), jnp.asarray(idx),
            jnp.asarray(idx), jnp.ones((1,), jnp.int32), sample=30)
        m = float(np.asarray(ratios).mean())
        assert 0.2 < m < 0.8

    def test_bucketed(self, rng):
        h, w, c = 16, 32, 4
        feat = rng.randn(1, h, w, c).astype(np.float32)
        idx = np.stack([rng.randint(0, w, (1, 30)),
                        rng.randint(0, h, (1, 30))], -1)
        dense = {"idx_src": jnp.asarray(idx), "idx_tgt": jnp.asarray(idx),
                 "valid": jnp.ones((1,), jnp.int32)}
        mask = jnp.zeros((1, h, w)).at[:, :, :16].set(1.0)
        out = descriptor_eval.bucketed_ratios(
            jnp.asarray(feat), jnp.asarray(feat), dense, mask)
        assert len(out["obs"]) + len(out["unobs"]) > 0


class TestPrimitiveCaching:
    def test_cache_and_tune_smoke(self, rng):
        from relativepose_tpu.config import ChannelLayout
        from relativepose_tpu.data import synthetic
        from relativepose_tpu.match.keypoints import KeypointConfig
        from relativepose_tpu.match.solver import (
            SolverHyperParams,
            SolverStaticConfig,
        )
        from relativepose_tpu.pipeline import PipelineConfig
        from relativepose_tpu.pipeline.oracle import make_oracle_completion_fn
        from relativepose_tpu.tune import sigma as st

        cfg = PipelineConfig(alter_steps=2,
                             keypoints=KeypointConfig(n_detect=64),
                             solver=SolverStaticConfig(power_iters=8))
        lay = cfg.layout
        pairs = []
        for i in range(2):
            ds, dt, T = synthetic.make_pair(i, "suncg", max_baseline=0.3)
            to_jax = lambda d: {k: jnp.asarray(v) for k, v in d.items()
                                if k != "pose"}
            pairs.append((to_jax(ds), to_jax(dt),
                          jnp.asarray(T.astype(np.float32))))

        factory = lambda ds, dt, p: make_oracle_completion_fn(ds, dt, lay)
        by_level, rgt = st.cache_primitives(
            factory, pairs, SolverHyperParams(), cfg)
        assert len(by_level) == 2 and len(by_level[0]) == 2
        assert rgt.shape == (2, 3, 3)

        ps, pt = st.stack_primitives(by_level[0])
        obj = st.make_objective(ps, pt, jnp.asarray(rgt),
                                SolverStaticConfig(power_iters=8))
        v = float(obj(jnp.asarray([0.2615, 0.2615, 0.04, 0.01])))
        assert np.isfinite(v)
