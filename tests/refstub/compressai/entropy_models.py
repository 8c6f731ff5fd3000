"""Torch EntropyBottleneck / GaussianConditional forward-only stubs.

Math restated from CompressAI's public semantics as recorded in SURVEY.md
(filter-chain cumulative logits; erfc standardized cumulative; sigma
lower bound 0.11) — the same contract dcae_tpu.entropy implements in JAX.
Parameter names/shapes match CompressAI so reference state_dicts load
(``_matrix{i}``, ``_bias{i}``, ``_factor{i}``, ``quantiles``).
"""

import math

import torch
import torch.nn as nn


class EntropyBottleneck(nn.Module):
    def __init__(self, channels, tail_mass=1e-9, init_scale=10.0,
                 filters=(3, 3, 3, 3)):
        super().__init__()
        self.channels = channels
        self.filters = tuple(filters)
        self.tail_mass = tail_mass
        dims = (1,) + self.filters + (1,)
        scale = init_scale ** (1.0 / (len(self.filters) + 1))
        for i in range(len(self.filters) + 1):
            init = math.log(math.expm1(1.0 / scale / dims[i + 1]))
            matrix = torch.full((channels, dims[i + 1], dims[i]), init)
            self.register_parameter(f"_matrix{i}", nn.Parameter(matrix))
            bias = torch.empty(channels, dims[i + 1], 1).uniform_(-0.5, 0.5)
            self.register_parameter(f"_bias{i}", nn.Parameter(bias))
            if i < len(self.filters):
                factor = torch.zeros(channels, dims[i + 1], 1)
                self.register_parameter(f"_factor{i}", nn.Parameter(factor))
        q = torch.tensor([-init_scale, 0.0, init_scale])
        self.quantiles = nn.Parameter(
            q.reshape(1, 1, 3).repeat(channels, 1, 1))

    def _get_medians(self):
        return self.quantiles[:, :, 1:2].detach().reshape(1, -1, 1, 1)

    def _logits_cumulative(self, inputs):
        logits = inputs
        for i in range(len(self.filters) + 1):
            matrix = getattr(self, f"_matrix{i}")
            logits = torch.matmul(torch.nn.functional.softplus(matrix),
                                  logits) + getattr(self, f"_bias{i}")
            if i < len(self.filters):
                factor = getattr(self, f"_factor{i}")
                logits = logits + torch.tanh(factor) * torch.tanh(logits)
        return logits

    def _likelihood(self, v_c1n):
        lower = self._logits_cumulative(v_c1n - 0.5)
        upper = self._logits_cumulative(v_c1n + 0.5)
        sign = -torch.sign(lower + upper).detach()
        return torch.abs(torch.sigmoid(sign * upper)
                         - torch.sigmoid(sign * lower))

    def forward(self, z):
        B, C, H, W = z.shape
        medians = self._get_medians()
        if self.training:
            values = z + torch.empty_like(z).uniform_(-0.5, 0.5)
        else:
            values = torch.round(z - medians) + medians
        v = values.permute(1, 0, 2, 3).reshape(C, 1, -1)
        like = self._likelihood(v)
        like = torch.clamp(like, min=1e-9)
        like = like.reshape(C, B, H, W).permute(1, 0, 2, 3)
        return values, like

    def loss(self):
        logits = self._logits_cumulative(self.quantiles)
        t = math.log(2.0 / self.tail_mass - 1.0)
        target = torch.tensor([-t, 0.0, t]).reshape(1, 1, 3)
        return torch.abs(logits - target).sum()


class GaussianConditional(nn.Module):
    def __init__(self, scale_table, scale_bound=0.11, tail_mass=1e-9):
        super().__init__()
        self.scale_bound = scale_bound
        self.tail_mass = tail_mass

    @staticmethod
    def _standardized_cumulative(x):
        const = -(2 ** -0.5)
        return 0.5 * torch.erfc(const * x)

    def _likelihood(self, inputs, scales, means=None):
        values = inputs if means is None else inputs - means
        scales = torch.clamp(scales, min=self.scale_bound)
        values = torch.abs(values)
        upper = self._standardized_cumulative((0.5 - values) / scales)
        lower = self._standardized_cumulative((-0.5 - values) / scales)
        return upper - lower

    def forward(self, inputs, scales, means=None):
        if self.training:
            values = inputs + torch.empty_like(inputs).uniform_(-0.5, 0.5)
        else:
            values = (inputs if means is None else
                      torch.round(inputs - means) + means)
        like = torch.clamp(self._likelihood(values, scales, means), min=1e-9)
        return values, like

    def update_scale_table(self, scale_table, force=False):
        return False
