"""timm.models.layers stub: the two symbols the reference imports."""

import torch.nn as nn
from torch.nn.init import trunc_normal_  # noqa: F401  (re-export)


class DropPath(nn.Module):
    """Identity at drop_prob=0 (the reference always passes 0 at eval)."""

    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        import torch
        mask = torch.empty(x.shape[0], *([1] * (x.ndim - 1)),
                           device=x.device).bernoulli_(keep)
        return x / keep * mask
