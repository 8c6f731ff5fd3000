import torch.nn as nn

from .entropy_models import EntropyBottleneck


class CompressionModel(nn.Module):
    def __init__(self, entropy_bottleneck_channels=192, **kwargs):
        super().__init__()
        self.entropy_bottleneck = EntropyBottleneck(
            entropy_bottleneck_channels)

    def aux_loss(self):
        return sum(m.loss() for m in self.modules()
                   if isinstance(m, EntropyBottleneck))

    def update(self, force=False):
        return False
