import torch.nn as nn


def conv3x3(in_ch, out_ch, stride=1):
    return nn.Conv2d(in_ch, out_ch, kernel_size=3, stride=stride, padding=1)


def subpel_conv3x3(in_ch, out_ch, r=1):
    return nn.Sequential(
        nn.Conv2d(in_ch, out_ch * r * r, kernel_size=3, padding=1),
        nn.PixelShuffle(r))


class AttentionBlock(nn.Module):
    pass


class ResidualBlock(nn.Module):
    pass


class ResidualBlockUpsample(nn.Module):
    pass


class ResidualBlockWithStride(nn.Module):
    pass
