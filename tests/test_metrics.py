"""Metric tests: PSNR identity, MS-SSIM sanity + oracle-free properties."""

import numpy as np
import jax.numpy as jnp
import pytest

from dcae_tpu.utils import metrics


class TestPSNR:
    def test_known_value(self):
        a = jnp.zeros((1, 8, 8, 3))
        b = jnp.full((1, 8, 8, 3), 0.1)
        assert abs(float(metrics.psnr(a, b)) - 20.0) < 1e-4

    def test_identical_is_large(self):
        a = jnp.full((1, 8, 8, 3), 0.5)
        assert float(metrics.psnr(a, a)) > 80


class TestMSSSIM:
    def test_identity_is_one(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 3)))
        assert float(metrics.ms_ssim(x, x)) > 0.9999

    def test_ordering(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 3)).astype(
            np.float32))
        small = jnp.clip(x + 0.02 * jnp.asarray(
            rng.normal(size=x.shape)), 0, 1)
        big = jnp.clip(x + 0.2 * jnp.asarray(
            rng.normal(size=x.shape)), 0, 1)
        ms_small = float(metrics.ms_ssim(x, small))
        ms_big = float(metrics.ms_ssim(x, big))
        assert ms_big < ms_small < 1.0

    def test_range(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (2, 176, 176, 3)))
        y = jnp.asarray(rng.uniform(0, 1, (2, 176, 176, 3)))
        v = float(metrics.ms_ssim(x, y))
        assert 0.0 <= v <= 1.0

    def test_msssim_vs_torch_oracle(self, rng):
        """Cross-check against an independent torch implementation of the
        same (Wang et al.) definition."""
        pytest.importorskip("torch")
        import torch
        import torch.nn.functional as F

        def t_gauss(size=11, sigma=1.5):
            c = torch.arange(size, dtype=torch.float64) - size // 2
            g = torch.exp(-(c ** 2) / (2 * sigma ** 2))
            return (g / g.sum()).float()

        def t_blur(x, win):
            C = x.shape[1]
            x = F.conv2d(x, win.view(1, 1, -1, 1).repeat(C, 1, 1, 1),
                         groups=C)
            return F.conv2d(x, win.view(1, 1, 1, -1).repeat(C, 1, 1, 1),
                            groups=C)

        def t_ssim_cs(x, y, win):
            c1, c2 = 0.01 ** 2, 0.03 ** 2
            mx, my = t_blur(x, win), t_blur(y, win)
            sxx = t_blur(x * x, win) - mx * mx
            syy = t_blur(y * y, win) - my * my
            sxy = t_blur(x * y, win) - mx * my
            cs = (2 * sxy + c2) / (sxx + syy + c2)
            ss = (2 * mx * my + c1) / (mx * mx + my * my + c1) * cs
            return ss.mean(dim=(1, 2, 3)), cs.mean(dim=(1, 2, 3))

        def t_msssim(x, y):
            weights = torch.tensor([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
            win = t_gauss()
            mcs, ss = [], None
            for i in range(5):
                ss, cs = t_ssim_cs(x, y, win)
                if i < 4:
                    mcs.append(cs.clamp(min=0))
                    x = F.avg_pool2d(x, 2)
                    y = F.avg_pool2d(y, 2)
            stack = torch.stack(mcs + [ss.clamp(min=0)])
            return (stack ** weights.view(-1, 1)).prod(dim=0).mean()

        x = rng.uniform(0, 1, (1, 192, 192, 3)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
        mine = float(metrics.ms_ssim(jnp.asarray(x), jnp.asarray(y)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        yt = torch.from_numpy(y).permute(0, 3, 1, 2)
        want = float(t_msssim(xt, yt))
        assert abs(mine - want) < 1e-4


class TestRates:
    def test_likelihood_bpp(self):
        like = {"y": jnp.full((1, 2, 2, 4), 0.5)}
        # 16 symbols at 1 bit each over 4 pixels = 4 bpp
        assert abs(float(metrics.likelihood_bpp(like, 4)) - 4.0) < 1e-5

    def test_real_bpp(self):
        strings = [[b"ab"], [b"c"]]
        assert metrics.real_bpp(strings, 8) == 3.0
