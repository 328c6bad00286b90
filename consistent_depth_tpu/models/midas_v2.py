"""MiDaS v2 backbone (reference adapter: monodepth/midas_v2_model.py;
architecture from the midas_v2 submodule: MidasNet — ResNeXt-101 32x8d
WSL encoder + RefineNet-style feature-fusion decoder, Ranftl et al.).

torch key layout mirrored for mechanical weight import:

    pretrained.layer1.{0,1}       stem conv/bn
    pretrained.layer1.4.{b}.*     resnet layer1 blocks
    pretrained.layer{2,3,4}.{b}.* resnet layers
    scratch.layer{1..4}_rn        3x3 transition convs (no bias)
    scratch.refinenet{1..4}.resConfUnit{1,2}.conv{1,2}
    scratch.output_conv.{0,2,4}

Adapter behavior matched to the reference: ImageNet mean/std applied to
the (BGR-ordered) input exactly as the reference does
(midas_v2_model.py:47-59), network emits non-negative disparity,
depth = 1/disparity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .base import DepthModel, FlaxVars
from .layers import TorchBatchNorm, conv, max_pool, resize_bilinear
from .resnet import bottleneck_layer

_NORM_MEAN = (0.485, 0.456, 0.406)
_NORM_STD = (0.229, 0.224, 0.225)


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = conv(self.features, 3, padding=1, name="conv1")(y)
        y = nn.relu(y)
        y = conv(self.features, 3, padding=1, name="conv2")(y)
        return y + x


class FeatureFusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        out = x
        # resConfUnit1 exists (and is checkpointed) even in refinenet4
        # where no skip input reaches it; materialize its params at init
        # time only, so weight import/export stays total without paying
        # its forward on every call
        unit1 = ResidualConvUnit(self.features, name="resConfUnit1")
        if skip is not None:
            out = out + unit1(skip)
        elif self.is_initializing():
            unit1(out)
        out = ResidualConvUnit(self.features, name="resConfUnit2")(out)
        H, W = out.shape[1:3]
        # torch: interpolate(scale_factor=2, bilinear, align_corners=True)
        return resize_bilinear(out, (2 * H, 2 * W), align_corners=True)


class MidasEncoder(nn.Module):
    """ResNeXt-101 32x8d grouped under MiDaS's "pretrained" Sequential
    naming: layer1 = [conv1, bn1, relu, maxpool, resnet.layer1]."""

    @nn.compact
    def __call__(self, x, train: bool):
        y = conv(64, 7, stride=2, padding=3, use_bias=False,
                 name="layer1_0")(x)
        y = TorchBatchNorm(name="layer1_1")(y, train)
        y = nn.relu(y)
        y = max_pool(y, 3, 2, 1)
        groups, wpg = 32, 8
        f1 = bottleneck_layer(
            y, train, groups * wpg, 256, 3, 1, groups, "layer1_4", 64)
        f2 = bottleneck_layer(
            f1, train, groups * wpg * 2, 512, 4, 2, groups, "layer2", 256)
        f3 = bottleneck_layer(
            f2, train, groups * wpg * 4, 1024, 23, 2, groups, "layer3", 512)
        f4 = bottleneck_layer(
            f3, train, groups * wpg * 8, 2048, 3, 2, groups, "layer4", 1024)
        return f1, f2, f3, f4


class MidasNet(nn.Module):
    features: int = 256
    non_negative: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        f1, f2, f3, f4 = MidasEncoder(name="pretrained")(x, train)

        rn = [
            conv(self.features, 3, padding=1, use_bias=False,
                 name=f"scratch_layer{i}_rn")(f)
            for i, f in ((1, f1), (2, f2), (3, f3), (4, f4))
        ]
        path4 = FeatureFusionBlock(
            self.features, name="scratch_refinenet4")(rn[3])
        path3 = FeatureFusionBlock(
            self.features, name="scratch_refinenet3")(path4, rn[2])
        path2 = FeatureFusionBlock(
            self.features, name="scratch_refinenet2")(path3, rn[1])
        path1 = FeatureFusionBlock(
            self.features, name="scratch_refinenet1")(path2, rn[0])

        y = conv(128, 3, padding=1, name="scratch_output_conv_0")(path1)
        H, W = y.shape[1:3]
        y = resize_bilinear(y, (2 * H, 2 * W), align_corners=False)
        y = conv(32, 3, padding=1, name="scratch_output_conv_2")(y)
        y = nn.relu(y)
        y = conv(1, 1, name="scratch_output_conv_4")(y)
        if self.non_negative:
            y = nn.relu(y)
        return y[..., 0]


class MidasV2Model(DepthModel):
    align = 32
    learning_rate = 0.0001
    lambda_view_baseline = 0.0001

    default_checkpoint = "checkpoints/midas2.pth"
    checkpoint_url_key = "midas2"

    def __init__(self, variables=None, checkpoint=None, seed: int = 0):
        if checkpoint is None:
            checkpoint = self._default_checkpoint_path()
        super().__init__(variables=variables, checkpoint=checkpoint, seed=seed)

    def _make_module(self):
        return MidasNet()

    def _init_variables(self, seed: int) -> FlaxVars:
        # jitted: see mannequin_challenge._init_variables
        return jax.jit(lambda rng: self.module.init(
            rng, jnp.zeros((1, 32, 32, 3)), train=False))(
                jax.random.PRNGKey(seed))

    def _load_checkpoint(self, path: str, template: FlaxVars) -> FlaxVars:
        from . import torch_import

        sd = torch_import.load_torch_checkpoint(path)
        # "scratch.layer1_rn.weight" groups to scratch/layer1_rn; our
        # flat names use scratch_layer1_rn etc. — rewrite the prefixes
        sd = {k.replace("scratch.", "scratch_").replace(
            "scratch_output_conv.", "scratch_output_conv_"): v
            for k, v in sd.items()}
        return torch_import.state_dict_to_variables(sd, template)

    def estimate_depth_pure(self, variables, images, train: bool):
        B, N, H, W, C = images.shape
        x = images.reshape(B * N, H, W, C)
        mean = jnp.asarray(_NORM_MEAN, x.dtype)
        std = jnp.asarray(_NORM_STD, x.dtype)
        x = (x - mean) / std
        if train:
            disp, mutated = self.module.apply(
                variables, x, train=True, mutable=["batch_stats"])
        else:
            disp = self.module.apply(variables, x, train=False)
            mutated = {}
        depth = 1.0 / disp
        return depth.reshape(B, N, H, W), mutated
