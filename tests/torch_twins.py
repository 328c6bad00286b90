"""Torch twin networks used as test oracles for weight import + forward
parity. These mirror the architectures of the reference's submodules
(which are not checked out in this environment) with identical
state_dict layouts, so a randomly-initialized twin checkpoint exercises
the same import path as the released pretrained checkpoints.
"""

import torch
import torch.nn as nn


def _inception(input_size, config):
    convs = nn.ModuleList()
    convs.append(nn.Sequential(
        nn.Conv2d(input_size, config[0][0], 1),
        nn.BatchNorm2d(config[0][0], affine=False),
        nn.ReLU(True),
    ))
    for i in range(1, len(config)):
        filt, out_a, out_b = config[i][0], config[i][1], config[i][2]
        convs.append(nn.Sequential(
            nn.Conv2d(input_size, out_a, 1),
            nn.BatchNorm2d(out_a, affine=False),
            nn.ReLU(True),
            nn.Conv2d(out_a, out_b, filt, padding=(filt - 1) // 2),
            nn.BatchNorm2d(out_b, affine=False),
            nn.ReLU(True),
        ))
    return convs


class Inception(nn.Module):
    def __init__(self, input_size, config):
        super().__init__()
        self.convs = _inception(input_size, config)

    def forward(self, x):
        return torch.cat([conv(x) for conv in self.convs], dim=1)


A = [[16], [3, 64, 16], [7, 64, 16], [11, 64, 16]]
BA = [[16], [3, 32, 16], [7, 32, 16], [11, 32, 16]]
B_ = [[32], [3, 32, 32], [5, 32, 32], [7, 32, 32]]
BC = [[32], [3, 64, 32], [7, 64, 32], [11, 64, 32]]
BB = [[32], [3, 64, 32], [5, 64, 32], [7, 64, 32]]
D = [[64], [3, 32, 64], [5, 32, 64], [7, 32, 64]]
E = [[64], [3, 32, 64], [5, 32, 64], [7, 32, 64]]
F_ = [[64], [3, 64, 64], [7, 64, 64], [11, 64, 64]]
G = [[32], [3, 32, 32], [5, 32, 32], [7, 32, 32]]


class _TwoBranch(nn.Module):
    def __init__(self, branches):
        super().__init__()
        self.list = nn.ModuleList(branches)

    def forward(self, x):
        return self.list[0](x) + self.list[1](x)


def Channels1():
    return _TwoBranch([
        nn.Sequential(Inception(256, E), Inception(256, E)),
        nn.Sequential(
            nn.AvgPool2d(2), Inception(256, E), Inception(256, E),
            Inception(256, E), nn.UpsamplingBilinear2d(scale_factor=2)),
    ])


def Channels2():
    return _TwoBranch([
        nn.Sequential(Inception(256, E), Inception(256, F_)),
        nn.Sequential(
            nn.AvgPool2d(2), Inception(256, E), Inception(256, E),
            Channels1(), Inception(256, E), Inception(256, F_),
            nn.UpsamplingBilinear2d(scale_factor=2)),
    ])


def Channels3():
    return _TwoBranch([
        nn.Sequential(
            nn.AvgPool2d(2), Inception(128, B_), Inception(128, D),
            Channels2(), Inception(256, E), Inception(256, G),
            nn.UpsamplingBilinear2d(scale_factor=2)),
        nn.Sequential(Inception(128, B_), Inception(128, BC)),
    ])


def Channels4():
    return _TwoBranch([
        nn.Sequential(
            nn.AvgPool2d(2), Inception(128, B_), Inception(128, B_),
            Channels3(), Inception(128, BB), Inception(128, BA),
            nn.UpsamplingBilinear2d(scale_factor=2)),
        nn.Sequential(Inception(128, A)),
    ])


class HourglassModelTwin(nn.Module):
    """Mirror of mannequin_challenge models/hourglass.py HourglassModel."""

    def __init__(self, num_input=3):
        super().__init__()
        self.seq = nn.Sequential(
            nn.Conv2d(num_input, 128, 7, padding=3),
            nn.BatchNorm2d(128),
            nn.ReLU(True),
            Channels4(),
        )
        self.uncertainty_layer = nn.Sequential(
            nn.Conv2d(64, 1, 3, padding=1), nn.Sigmoid())
        self.pred_layer = nn.Conv2d(64, 1, 3, padding=1)

    def forward(self, x):
        feats = self.seq(x)
        pred_d = self.pred_layer(feats)
        pred_conf = self.uncertainty_layer(feats)
        return pred_d, pred_conf
