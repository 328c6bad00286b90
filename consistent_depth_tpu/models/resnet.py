"""torchvision-style ResNet/ResNeXt building blocks in Flax (NHWC).

Module names mirror the torch state_dict layout so the generic importer
(:mod:`consistent_depth_tpu.models.torch_import`) maps weights
mechanically:

    conv1 / bn1 / layer{L}_{B} / (conv1, bn1, conv2, bn2[, conv3, bn3,
    downsample_0, downsample_1]) / fc

Used by the monodepth2 backbone (ResNet-18 encoder) and the MiDaS v2
backbone (ResNeXt-101 32x8d encoder).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import TorchBatchNorm, conv, max_pool


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = conv(self.features, 3, stride=self.stride, padding=1,
                 use_bias=False, name="conv1")(x)
        y = TorchBatchNorm(name="bn1")(y, train)
        y = nn.relu(y)
        y = conv(self.features, 3, padding=1, use_bias=False, name="conv2")(y)
        y = TorchBatchNorm(name="bn2")(y, train)
        if self.downsample:
            identity = conv(self.features, 1, stride=self.stride,
                            use_bias=False, name="downsample_0")(x)
            identity = TorchBatchNorm(name="downsample_1")(identity, train)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    width: int          # conv2 width (groups * width_per_group scaled)
    features: int       # output channels (expansion applied)
    stride: int = 1
    groups: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = conv(self.width, 1, use_bias=False, name="conv1")(x)
        y = TorchBatchNorm(name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.width, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], feature_group_count=self.groups,
                    use_bias=False, name="conv2")(y)
        y = TorchBatchNorm(name="bn2")(y, train)
        y = nn.relu(y)
        y = conv(self.features, 1, use_bias=False, name="conv3")(y)
        y = TorchBatchNorm(name="bn3")(y, train)
        if self.downsample:
            identity = conv(self.features, 1, stride=self.stride,
                            use_bias=False, name="downsample_0")(x)
            identity = TorchBatchNorm(name="downsample_1")(identity, train)
        return nn.relu(y + identity)


def resnet_stem(x, train: bool, features: int = 64):
    """conv1 7x7/2 + bn1 + relu (maxpool applied separately)."""
    y = conv(features, 7, stride=2, padding=3, use_bias=False,
             name="conv1")(x)
    y = TorchBatchNorm(name="bn1")(y, train)
    return nn.relu(y)


def basic_layer(x, train: bool, features: int, blocks: int, stride: int,
                prefix: str, in_features: int):
    for b in range(blocks):
        s = stride if b == 0 else 1
        ds = b == 0 and (s != 1 or in_features != features)
        x = BasicBlock(features, stride=s, downsample=ds,
                       name=f"{prefix}_{b}")(x, train)
    return x


def bottleneck_layer(x, train: bool, width: int, features: int, blocks: int,
                     stride: int, groups: int, prefix: str, in_features: int):
    for b in range(blocks):
        s = stride if b == 0 else 1
        ds = b == 0 and (s != 1 or in_features != features)
        x = Bottleneck(width=width, features=features, stride=s,
                       groups=groups, downsample=ds,
                       name=f"{prefix}_{b}")(x, train)
    return x


class ResNet18Features(nn.Module):
    """ResNet-18 exposing the 5 feature maps monodepth2's encoder uses
    (relu(bn1(conv1)), layer1..layer4)."""

    @nn.compact
    def __call__(self, x, train: bool) -> Tuple[jnp.ndarray, ...]:
        f0 = resnet_stem(x, train)
        y = max_pool(f0, 3, 2, 1)
        f1 = basic_layer(y, train, 64, 2, 1, "layer1", 64)
        f2 = basic_layer(f1, train, 128, 2, 2, "layer2", 64)
        f3 = basic_layer(f2, train, 256, 2, 2, "layer3", 128)
        f4 = basic_layer(f3, train, 512, 2, 2, "layer4", 256)
        return f0, f1, f2, f3, f4


class ResNeXt101_32x8dFeatures(nn.Module):
    """ResNeXt-101 32x8d exposing layer1..layer4 outputs (256, 512,
    1024, 2048 channels) — the MiDaS v2 encoder."""

    @nn.compact
    def __call__(self, x, train: bool) -> Tuple[jnp.ndarray, ...]:
        y = resnet_stem(x, train)
        y = max_pool(y, 3, 2, 1)
        groups, wpg = 32, 8
        widths = [groups * wpg * m for m in (1, 2, 4, 8)]  # 256..2048
        f1 = bottleneck_layer(
            y, train, widths[0], 256, 3, 1, groups, "layer1", 64)
        f2 = bottleneck_layer(
            f1, train, widths[1], 512, 4, 2, groups, "layer2", 256)
        f3 = bottleneck_layer(
            f2, train, widths[2], 1024, 23, 2, groups, "layer3", 512)
        f4 = bottleneck_layer(
            f3, train, widths[3], 2048, 3, 2, groups, "layer4", 1024)
        return f1, f2, f3, f4
