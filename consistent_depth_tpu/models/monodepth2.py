"""Monodepth2 backbone (reference adapter: monodepth/monodepth2_model.py;
architecture from the monodepth2 submodule: ResnetEncoder(18) +
DepthDecoder(scales=0..3), Godard et al., ICCV 2019).

Decoder: nearest-2x upsampling U-Net over the 5 encoder features with
reflection-padded 3x3 convs + ELU; sigmoid disparity heads at 4 scales.
torch key layout mirrored: "encoder.*" and "decoder.{i}.conv[.conv]"
with the OrderedDict enumeration (upconv 4..0 x {0,1}, dispconv 0..3).

Adapter behavior matched to the reference: bicubic resize of the input
to the checkpoint's 1024x320 feed size, disparity resized back bicubic,
depth = 1/disparity (monodepth2_model.py:63-89). The KITTI preset
selects this backbone (params.py:102-107).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .base import DepthModel, FlaxVars
from .layers import resize_bicubic, upsample_nearest_2x
from .resnet import ResNet18Features

NUM_CH_ENC = (64, 64, 128, 256, 512)
NUM_CH_DEC = (16, 32, 64, 128, 256)


class ReflectConv3x3(nn.Module):
    """monodepth2 Conv3x3: reflection pad 1 + 3x3 conv ("conv" child)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return nn.Conv(self.features, (3, 3), padding="VALID",
                       name="conv")(x)


class ConvBlock(nn.Module):
    """Conv3x3 + ELU ("conv.conv" nesting in the torch keys)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.elu(ReflectConv3x3(self.features, name="conv")(x))


def depth_decoder(features, use_skips: bool = True,
                  scales: Tuple[int, ...] = (0, 1, 2, 3)):
    """Inline decoder so flax names stay flat "decoder_{i}" matching the
    torch ModuleList keys "decoder.{i}.*". torch enumerates the convs
    OrderedDict: upconv (4..0, {0, 1}) then dispconv (0..3) ->
    decoder.0 .. decoder.13."""
    idx = 0
    upconvs = {}
    for i in range(4, -1, -1):
        for j in (0, 1):
            upconvs[(i, j)] = idx
            idx += 1
    disp_idx = {s: idx + k for k, s in enumerate(range(4))}

    outputs = {}
    x = features[-1]
    for i in range(4, -1, -1):
        x = ConvBlock(NUM_CH_DEC[i], name=f"decoder_{upconvs[(i, 0)]}")(x)
        x = [upsample_nearest_2x(x)]
        if use_skips and i > 0:
            x += [features[i - 1]]
        x = jnp.concatenate(x, axis=-1)
        x = ConvBlock(NUM_CH_DEC[i], name=f"decoder_{upconvs[(i, 1)]}")(x)
        if i in scales:
            outputs[i] = nn.sigmoid(
                ReflectConv3x3(1, name=f"decoder_{disp_idx[i]}")(x))
    return outputs


class Monodepth2Net(nn.Module):
    """encoder + decoder; input (B, H, W, 3) in [0, 1] (the channel
    order is whatever the pipeline feeds — BGR — matching the
    reference's usage)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        # monodepth2 ResnetEncoder normalization
        x = (x - 0.45) / 0.225
        features = ResNet18Features(name="encoder")(x, train)
        return depth_decoder(features)


class Monodepth2Model(DepthModel):
    align = 1
    learning_rate = 0.00004
    lambda_view_baseline = 1

    default_checkpoint = "checkpoints/monodepth2_mono+stereo_1024x320"
    checkpoint_url_key = "monodepth2"
    feed_height = 320
    feed_width = 1024

    def __init__(self, variables=None, checkpoint=None, seed: int = 0,
                 feed_size=None):
        if checkpoint is None:
            checkpoint = self._default_checkpoint_path()
        if feed_size is not None:
            self.feed_height, self.feed_width = feed_size
        super().__init__(variables=variables, checkpoint=checkpoint, seed=seed)

    def _make_module(self):
        return Monodepth2Net()

    def _init_variables(self, seed: int) -> FlaxVars:
        # jitted: see mannequin_challenge._init_variables
        return jax.jit(lambda rng: self.module.init(
            rng, jnp.zeros((1, 32, 32, 3)), train=False))(
                jax.random.PRNGKey(seed))

    def _load_checkpoint(self, path: str, template: FlaxVars) -> FlaxVars:
        """The released checkpoint is a directory with encoder.pth
        (carrying the feed size) and depth.pth
        (reference: monodepth2_model.py:26-50)."""
        import os

        from . import torch_import

        if os.path.isdir(path):
            enc = torch_import.load_torch_checkpoint(
                os.path.join(path, "encoder.pth"))
            self.feed_height = int(enc.pop("height", self.feed_height))
            self.feed_width = int(enc.pop("width", self.feed_width))
            enc.pop("use_stereo", None)
            dec = torch_import.load_torch_checkpoint(
                os.path.join(path, "depth.pth"))
            # ResnetEncoder/DepthDecoder state_dicts already carry the
            # "encoder." / "decoder." child prefixes
            sd = {**enc, **dec}
            return torch_import.state_dict_to_variables(sd, template)
        return super()._load_checkpoint(path, template)

    def estimate_depth_pure(self, variables, images, train: bool):
        B, N, H, W, C = images.shape
        x = images.reshape(B * N, H, W, C)
        x = resize_bicubic(x, (self.feed_height, self.feed_width),
                           align_corners=False)
        if train:
            outputs, mutated = self.module.apply(
                variables, x, train=True, mutable=["batch_stats"])
        else:
            outputs = self.module.apply(variables, x, train=False)
            mutated = {}
        disp = outputs[0]
        disp = resize_bicubic(disp, (H, W), align_corners=False)
        depth = 1.0 / disp[..., 0]
        return depth.reshape(B, N, H, W), mutated
