import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relativepose_tpu.config import ChannelLayout
from relativepose_tpu.models import Resnet18_8s, SCNet, SegmentationHead
from relativepose_tpu.models.blocks import BatchNorm2d, ConvBlock, DeconvBlock


class TestBlocks:
    @pytest.mark.parametrize("k,s,p", [(4, 2, 1), (3, 1, 1), (3, 2, 0),
                                       (3, 1, 0)])
    def test_deconv_matches_torch(self, rng, k, s, p):
        """DeconvBlock must equal torch ConvTranspose2d bit-for-bit (up to
        f32 rounding) for the geometries SCNet uses."""
        import torch
        cin, cout, hw = 3, 5, 7
        x = rng.randn(2, hw, hw, cin).astype(np.float32)
        blk = DeconvBlock(cout, k, s, p, batchnorm=False, act=False)
        params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(blk.apply(params, jnp.asarray(x)))

        tconv = torch.nn.ConvTranspose2d(cin, cout, k, s, p, bias=True)
        w = np.asarray(params["params"]["kernel"])  # [kh, kw, in, out]
        # our non-flipped dilated conv kernel corresponds to the spatially
        # flipped torch kernel
        tconv.weight.data = torch.from_numpy(
            np.ascontiguousarray(w[::-1, ::-1].transpose(2, 3, 0, 1)))
        tconv.bias.data = torch.from_numpy(np.asarray(params["params"]["bias"]))
        with torch.no_grad():
            yt = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        yt = yt.numpy().transpose(0, 2, 3, 1)
        assert y.shape == yt.shape
        np.testing.assert_allclose(y, yt, atol=1e-4)

    def test_conv_block_matches_torch_geometry(self, rng):
        import torch
        x = rng.randn(1, 10, 10, 4).astype(np.float32)
        blk = ConvBlock(6, 4, 2, 1, batchnorm=False, act=False)
        params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(blk.apply(params, jnp.asarray(x)))
        assert y.shape == (1, 5, 5, 6)  # torch: floor((10+2-4)/2)+1 = 5

    def test_batchnorm_batch_stats(self, rng):
        x = rng.randn(8, 4, 4, 3).astype(np.float32) * 5 + 2
        bn = BatchNorm2d()
        params = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(bn.apply(params, jnp.asarray(x)))
        scale = np.asarray(params["params"]["scale"]) + 1.0
        mu = y.mean((0, 1, 2)) / scale
        sd = y.std((0, 1, 2)) / scale
        np.testing.assert_allclose(mu, 0.0, atol=1e-2)
        np.testing.assert_allclose(np.abs(sd), 1.0, atol=1e-2)


class TestResnet18_8s:
    def test_output_shape_and_tanh(self, rng):
        x = rng.rand(2, 160, 640, 7).astype(np.float32)
        net = Resnet18_8s(num_input=7, use_tanh=True)
        params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(net.apply(params, jnp.asarray(x)))
        assert y.shape == (2, 160, 640, 32)
        assert np.abs(y).max() <= 1.0

    def test_param_count_matches_resnet18_scale(self):
        x = jnp.zeros((1, 64, 64, 7))
        net = Resnet18_8s()
        params = net.init(jax.random.PRNGKey(0), x)
        n = sum(p.size for p in jax.tree.leaves(params))
        # torchvision resnet18 trunk is ~11.2M; ours adds 3 score convs and
        # swaps conv1 to 7 channels
        assert 10_500_000 < n < 12_500_000, n

    def test_segmentation_head(self, rng):
        feat = jnp.asarray(rng.rand(2, 8, 8, 32).astype(np.float32))
        head = SegmentationHead(num_classes=15)
        params = head.init(jax.random.PRNGKey(0), feat)
        y = head.apply(params, feat)
        assert y.shape == (2, 8, 8, 15)


class TestSCNet:
    @pytest.mark.parametrize("output_type,snumclass", [
        ("rgbdnsf", 15), ("rgbdnsf", 21), ("rgbdn", 15)])
    def test_output_channels(self, rng, output_type, snumclass):
        x = rng.rand(1, 160, 640, 16).astype(np.float32)
        net = SCNet(output_type=output_type, snumclass=snumclass)
        params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = net.apply(params, jnp.asarray(x))
        expected = ChannelLayout(output_type, snumclass).num_output
        assert y.shape == (1, 160, 640, expected)

    def test_channel_layout(self):
        lay = ChannelLayout("rgbdnsf", 15, 32)
        assert lay.spans["rgb"] == (0, 3)
        assert lay.spans["n"] == (3, 6)
        assert lay.spans["d"] == (6, 7)
        assert lay.spans["s"] == (7, 22)
        assert lay.spans["f"] == (22, 54)
        assert lay.num_output == 54
        # evaluation.py:137: idx_f_start = 3+3+1+snumclass
        assert lay.spans["f"][0] == 3 + 3 + 1 + 15

    def test_feature_channels_tanh_bounded(self, rng):
        x = rng.rand(1, 96, 96, 16).astype(np.float32)
        net = SCNet(output_type="rgbdnsf", snumclass=15, use_tanh=True)
        params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(net.apply(params, jnp.asarray(x)))
        lay = ChannelLayout("rgbdnsf", 15, 32)
        f = y[..., lay.slice_of("f")]
        assert np.abs(f).max() <= 1.0 + 1e-5

    def test_shared_stems_between_views(self, rng):
        """The warped-counterpart stems share weights with the own-view
        stems: feeding the counterpart channels as the own view must produce
        the same stem activations (checked indirectly: swapping the two
        8-channel halves changes the output, but the parameter tree has only
        ONE set of conv1rgb..conv3d stems)."""
        x = jnp.zeros((1, 64, 64, 16))
        net = SCNet(output_type="rgbd")
        params = net.init(jax.random.PRNGKey(0), x)
        names = list(params["params"].keys())
        stems = [n for n in names if n.startswith("ConvBlock")]
        # 9 stem blocks (3 modalities x 3 convs) + 6 trunk convs = 15
        assert len(stems) == 15, stems

    def test_bfloat16_compute(self, rng):
        x = rng.rand(1, 64, 64, 16).astype(np.float32)
        net = SCNet(output_type="rgbdnsf", dtype=jnp.bfloat16)
        params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = net.apply(params, jnp.asarray(x, dtype=jnp.bfloat16))
        assert y.dtype == jnp.bfloat16
        assert np.all(np.isfinite(np.asarray(y, dtype=np.float32)))
