"""Block-library tests: geometry vs torch (conv/deconv tap alignment) and
numeric parity of window attention / gated MLP against torch oracles with
transplanted weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from dcae_tpu.ops import (
    Conv, Deconv, WMSA, ConvolutionalGLU, DictionaryCrossAttention,
    MultiScaleAggregation, ResidualBottleneckBlock,
    ResidualBottleneckBlockWithStride, ResidualBottleneckBlockWithUpsample,
    ResScaleConvolutionGateBlock, SwinStack, pad_spatial, crop_spatial,
)
from tests import torch_numeric_ref as oracle


def init_and_apply(module, *args, seed=0):
    variables = module.init(jax.random.PRNGKey(seed), *args)
    return variables, module.apply(variables, *args)


class TestConvGeometry:
    @pytest.mark.parametrize("k,s,size", [(5, 2, 16), (3, 2, 16), (5, 1, 15),
                                          (3, 1, 9), (1, 1, 8), (7, 1, 12)])
    def test_conv_matches_torch(self, k, s, size, rng):
        """Explicit k//2 padding must match torch Conv2d exactly (tap
        alignment matters for stride 2)."""
        x = rng.normal(0, 1, (2, size, size, 3)).astype(np.float32)
        m = Conv(4, k, stride=s)
        variables, y = init_and_apply(m, jnp.array(x))
        w = np.asarray(variables["params"]["conv"]["kernel"])  # (k,k,in,out)
        b = np.asarray(variables["params"]["conv"]["bias"])
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
        yt = F.conv2d(xt, wt, torch.from_numpy(b), stride=s, padding=k // 2)
        np.testing.assert_allclose(
            np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), atol=2e-5)

    @pytest.mark.parametrize("k,s", [(5, 2), (3, 2)])
    def test_deconv_matches_torch(self, k, s, rng):
        """Deconv == torch ConvTranspose2d(padding=k//2, output_padding=s-1)
        with spatially flipped weights."""
        x = rng.normal(0, 1, (2, 8, 8, 3)).astype(np.float32)
        m = Deconv(4, k, s)
        variables, y = init_and_apply(m, jnp.array(x))
        w = np.asarray(variables["params"]["kernel"])  # (k,k,in,out)
        b = np.asarray(variables["params"]["bias"])
        wt = torch.from_numpy(
            np.ascontiguousarray(w[::-1, ::-1].transpose(2, 3, 0, 1)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        yt = F.conv_transpose2d(xt, wt, torch.from_numpy(b), stride=s,
                                padding=k // 2, output_padding=s - 1)
        assert y.shape == (2, 8 * s, 8 * s, 4)
        np.testing.assert_allclose(
            np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), atol=2e-5)

    def test_depthwise_matches_torch(self, rng):
        x = rng.normal(0, 1, (1, 6, 6, 8)).astype(np.float32)
        m = Conv(8, 3, groups=8)
        variables, y = init_and_apply(m, jnp.array(x))
        w = np.asarray(variables["params"]["conv"]["kernel"])  # (3,3,1,8)
        b = np.asarray(variables["params"]["conv"]["bias"])
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # (8,1,3,3)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        yt = F.conv2d(xt, wt, torch.from_numpy(b), padding=1, groups=8)
        np.testing.assert_allclose(
            np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), atol=2e-5)


class TestResidualBlocks:
    def test_shapes(self, rng):
        x = jnp.array(rng.normal(0, 1, (2, 16, 16, 6)).astype(np.float32))
        _, y = init_and_apply(ResidualBottleneckBlock(10), x)
        assert y.shape == (2, 16, 16, 10)
        _, y = init_and_apply(ResidualBottleneckBlockWithStride(12), x)
        assert y.shape == (2, 8, 8, 12)
        _, y = init_and_apply(ResidualBottleneckBlockWithUpsample(4), x)
        assert y.shape == (2, 32, 32, 4)

    def test_identity_skip_when_same_channels(self, rng):
        x = jnp.array(rng.normal(0, 1, (1, 8, 8, 6)).astype(np.float32))
        m = ResidualBottleneckBlock(6)
        variables = m.init(jax.random.PRNGKey(0), x)
        assert "skip" not in variables["params"]


class TestWMSA:
    @pytest.mark.parametrize("shifted", [False, True])
    def test_matches_torch_oracle(self, shifted, rng):
        window, head_dim, C = 4, 4, 8
        x = rng.normal(0, 1, (2, 8, 12, C)).astype(np.float32)
        m = WMSA(head_dim=head_dim, window_size=window, shifted=shifted)
        variables, y = init_and_apply(m, jnp.array(x))
        p = variables["params"]
        qkv_w = np.asarray(p["qkv_kernel"]).T  # torch (3C, C)
        qkv_b = np.asarray(p["qkv_bias"])
        proj_w = np.asarray(p["proj_kernel"]).T
        proj_b = np.asarray(p["proj_bias"])
        rel = np.asarray(p["relative_position"])
        want = oracle.torch_wmsa(x, qkv_w, qkv_b, proj_w, proj_b, rel,
                                 head_dim, window, shifted)
        np.testing.assert_allclose(np.asarray(y), want, atol=3e-5)

    def test_shifted_differs_from_plain(self, rng):
        x = jnp.array(rng.normal(0, 1, (1, 8, 8, 8)).astype(np.float32))
        m_w = WMSA(head_dim=4, window_size=4, shifted=False)
        variables = m_w.init(jax.random.PRNGKey(0), x)
        m_sw = WMSA(head_dim=4, window_size=4, shifted=True)
        y_w = m_w.apply(variables, x)
        y_sw = m_sw.apply(variables, x)
        assert not np.allclose(np.asarray(y_w), np.asarray(y_sw))


class TestConvGLU:
    def test_matches_torch_oracle(self, rng):
        C = 8
        x = rng.normal(0, 1, (2, 6, 6, C)).astype(np.float32)
        m = ConvolutionalGLU(hidden_features=4 * C)
        variables, y = init_and_apply(m, jnp.array(x))
        p = variables["params"]
        fc1_w = np.asarray(p["fc1"]["dense"]["kernel"]).T
        fc1_b = np.asarray(p["fc1"]["dense"]["bias"])
        dw = np.asarray(p["dwconv"]["dw"]["conv"]["kernel"])  # (3,3,1,h)
        dw_w = dw.transpose(3, 2, 0, 1)
        dw_b = np.asarray(p["dwconv"]["dw"]["conv"]["bias"])
        fc2_w = np.asarray(p["fc2"]["dense"]["kernel"]).T
        fc2_b = np.asarray(p["fc2"]["dense"]["bias"])
        want = oracle.torch_conv_glu(x, fc1_w, fc1_b, dw_w, dw_b, fc2_w,
                                     fc2_b)
        np.testing.assert_allclose(np.asarray(y), want, atol=3e-5)


class TestSwinStack:
    def test_shape_invariance_and_grad(self, rng):
        x = jnp.array(rng.normal(0, 1, (1, 8, 8, 8)).astype(np.float32))
        m = SwinStack(head_dim=4, window_size=4, block_num=2)
        variables, y = init_and_apply(m, x)
        assert y.shape == x.shape
        g = jax.grad(lambda v: m.apply(v, x).sum())(variables)
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)

    def test_small_input_padding_path(self, rng):
        """Inputs smaller than the window must still work (hyper path on
        small z maps)."""
        x = jnp.array(rng.normal(0, 1, (1, 2, 2, 8)).astype(np.float32))
        m = SwinStack(head_dim=4, window_size=4, block_num=1)
        _, y = init_and_apply(m, x)
        assert y.shape == x.shape


class TestDictionaryAttention:
    def test_shapes_and_grad(self, rng):
        q = jnp.array(rng.normal(0, 1, (2, 4, 4, 24)).astype(np.float32))
        dt = jnp.array(rng.normal(0, 1, (8, 16)).astype(np.float32))
        m = DictionaryCrossAttention(output_dim=20, head_num=2, head_dim=8)
        variables, y = init_and_apply(m, q, dt)
        assert y.shape == (2, 4, 4, 20)
        g = jax.grad(lambda v: m.apply(v, q, dt).sum())(variables)
        assert all(np.all(np.isfinite(np.asarray(l)))
                   for l in jax.tree.leaves(g))

    def test_msa_shape(self, rng):
        x = jnp.array(rng.normal(0, 1, (1, 4, 4, 16)).astype(np.float32))
        _, y = init_and_apply(MultiScaleAggregation(), x)
        assert y.shape == x.shape


class TestPadCrop:
    def test_pad_crop_round_trip(self, rng):
        x = jnp.array(rng.normal(0, 1, (1, 37, 53, 3)).astype(np.float32))
        padded, padding = pad_spatial(x, 64)
        assert padded.shape[1] % 64 == 0 and padded.shape[2] % 64 == 0
        back = crop_spatial(padded, padding)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
