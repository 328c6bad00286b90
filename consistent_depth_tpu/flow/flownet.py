"""FlowNet-family optical-flow networks in Flax (NHWC).

TPU-native re-implementation of the architectures behind the
reference's flow stage (the flownet2 submodule's FlowNetS / FlowNetC
and the FlowNet2 C->S->S stack; reference usage:
optical_flow_flownet2_homography.py:242-266). The custom CUDA ops map
to first-party TPU code:

    correlation_package  -> consistent_depth_tpu.flow.correlation
    resample2d_package   -> flow_warp (bilinear, zeros padding)
    channelnorm_package  -> channel_norm (trivial jnp)

Module names mirror the torch layout (conv1.0.weight etc. — each conv
is Sequential(Conv2d, LeakyReLU)) so pretrained flownet2 checkpoints
import through the mechanical state_dict importer when available.
Weights are external inputs in this environment; the precomputed-flow
backend remains the parity default.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resample import bilinear_sample_pixels
from .correlation import correlation_auto


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def conv_block(x, features, kernel, stride, name):
    """conv(batchNorm=False, ...) = Conv2d + LeakyReLU(0.1). Defined
    inline (torch key "conv1.0.weight" groups to the flat flax name
    "conv1_0")."""
    pad = (kernel - 1) // 2
    y = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)], name=f"{name}_0")(x)
    return _leaky(y)


def deconv_block(x, features, name):
    """deconv = ConvTranspose2d(4, 2, 1) + LeakyReLU(0.1). torch's
    (k=4, s=2, p=1) corresponds to flax padding (2, 2) per dim
    (out = 2*in); transpose_kernel=True matches torch's (I, O, kh, kw)
    layout through the generic (2, 3, 1, 0) import transpose."""
    y = nn.ConvTranspose(
        features, (4, 4), strides=(2, 2),
        padding=[(2, 2), (2, 2)], transpose_kernel=True,
        name=f"{name}_0")(x)
    return _leaky(y)


def predict_flow(x, name: str):
    return nn.Conv(2, (3, 3), padding=[(1, 1), (1, 1)], name=name)(x)


def upsample_flow(x, name: str):
    return nn.ConvTranspose(
        2, (4, 4), strides=(2, 2), padding=[(2, 2), (2, 2)],
        transpose_kernel=True, use_bias=False, name=name)(x)


def flow_warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Resample2d: warp ``image`` (B, H, W, C) by ``flow`` (B, H, W, 2)
    in pixels, bilinear, out-of-image reads zero."""
    B, H, W, _ = image.shape
    xs = jnp.arange(W, dtype=flow.dtype)
    ys = jnp.arange(H, dtype=flow.dtype)
    X, Y = jnp.meshgrid(xs, ys)
    x = X + flow[..., 0]
    y = Y + flow[..., 1]
    out = jax.vmap(bilinear_sample_pixels)(image, x, y)
    in_img = ((x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1))
    return out * in_img[..., None].astype(out.dtype)


def channel_norm(x: jnp.ndarray) -> jnp.ndarray:
    """ChannelNorm: L2 norm over channels, keepdims."""
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))


def _refinement(out_conv2, out_conv3, out_conv4, out_conv5, out_conv6):
    """Shared FlowNetS/C decoder: coarse-to-fine flow prediction with
    deconv skip concatenation. Returns flow2..flow6 (NHWC, 2ch)."""
    flow6 = predict_flow(out_conv6, "predict_flow6")
    flow6_up = upsample_flow(flow6, "upsampled_flow6_to_5")
    out_deconv5 = deconv_block(out_conv6, 512, "deconv5")

    concat5 = jnp.concatenate((out_conv5, out_deconv5, flow6_up), -1)
    flow5 = predict_flow(concat5, "predict_flow5")
    flow5_up = upsample_flow(flow5, "upsampled_flow5_to_4")
    out_deconv4 = deconv_block(concat5, 256, "deconv4")

    concat4 = jnp.concatenate((out_conv4, out_deconv4, flow5_up), -1)
    flow4 = predict_flow(concat4, "predict_flow4")
    flow4_up = upsample_flow(flow4, "upsampled_flow4_to_3")
    out_deconv3 = deconv_block(concat4, 128, "deconv3")

    concat3 = jnp.concatenate((out_conv3, out_deconv3, flow4_up), -1)
    flow3 = predict_flow(concat3, "predict_flow3")
    flow3_up = upsample_flow(flow3, "upsampled_flow3_to_2")
    out_deconv2 = deconv_block(concat3, 64, "deconv2")

    concat2 = jnp.concatenate((out_conv2, out_deconv2, flow3_up), -1)
    flow2 = predict_flow(concat2, "predict_flow2")
    return flow2, flow3, flow4, flow5, flow6


class FlowNetS(nn.Module):
    """FlowNetS: plain encoder over channel-concatenated inputs."""

    input_channels: int = 12  # 6 for standalone, 12 inside FlowNet2

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        out_conv1 = conv_block(x, 64, 7, 2, "conv1")
        out_conv2 = conv_block(out_conv1, 128, 5, 2, "conv2")
        out_conv3 = conv_block(out_conv2, 256, 5, 2, "conv3")
        out_conv3 = conv_block(out_conv3, 256, 3, 1, "conv3_1")
        out_conv4 = conv_block(out_conv3, 512, 3, 2, "conv4")
        out_conv4 = conv_block(out_conv4, 512, 3, 1, "conv4_1")
        out_conv5 = conv_block(out_conv4, 512, 3, 2, "conv5")
        out_conv5 = conv_block(out_conv5, 512, 3, 1, "conv5_1")
        out_conv6 = conv_block(out_conv5, 1024, 3, 2, "conv6")
        out_conv6 = conv_block(out_conv6, 1024, 3, 1, "conv6_1")
        return _refinement(
            out_conv2, out_conv3, out_conv4, out_conv5, out_conv6)


class FlowNetC(nn.Module):
    """FlowNetC: siamese encoder + correlation cost volume."""

    max_displacement: int = 20
    corr_stride: int = 2

    @nn.compact
    def __call__(self, x1, x2) -> Tuple[jnp.ndarray, ...]:
        def shared_conv(features, kernel, stride, name):
            pad = (kernel - 1) // 2
            return nn.Conv(
                features, (kernel, kernel), strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)], name=f"{name}_0")

        # siamese encoder: same instances applied to both images
        conv1 = shared_conv(64, 7, 2, "conv1")
        conv2 = shared_conv(128, 5, 2, "conv2")
        conv3 = shared_conv(256, 5, 2, "conv3")

        out_conv1a = _leaky(conv1(x1))
        out_conv2a = _leaky(conv2(out_conv1a))
        out_conv3a = _leaky(conv3(out_conv2a))
        out_conv1b = _leaky(conv1(x2))
        out_conv2b = _leaky(conv2(out_conv1b))
        out_conv3b = _leaky(conv3(out_conv2b))

        out_corr = correlation_auto(
            out_conv3a, out_conv3b,
            max_displacement=self.max_displacement,
            stride=self.corr_stride)
        out_corr = _leaky(out_corr)
        out_redir = conv_block(out_conv3a, 32, 1, 1, "conv_redir")
        merged = jnp.concatenate((out_redir, out_corr), -1)

        out_conv3 = conv_block(merged, 256, 3, 1, "conv3_1")
        out_conv4 = conv_block(out_conv3, 512, 3, 2, "conv4")
        out_conv4 = conv_block(out_conv4, 512, 3, 1, "conv4_1")
        out_conv5 = conv_block(out_conv4, 512, 3, 2, "conv5")
        out_conv5 = conv_block(out_conv5, 512, 3, 1, "conv5_1")
        out_conv6 = conv_block(out_conv5, 1024, 3, 2, "conv6")
        out_conv6 = conv_block(out_conv6, 1024, 3, 1, "conv6_1")
        return _refinement(
            out_conv2a, out_conv3, out_conv4, out_conv5, out_conv6)


def inter_conv(x, features, name):
    """i_conv = Conv2d(3, 1, 1) with bias, NO activation (FlowNetSD /
    FlowNetFusion intermediate convs)."""
    return nn.Conv(features, (3, 3), padding=[(1, 1), (1, 1)],
                   name=f"{name}_0")(x)


class FlowNetSD(nn.Module):
    """FlowNetSD: the small-displacement branch of FlowNet2. Plain
    encoder over 6 concatenated input channels with 3x3-only convs and
    an extra stride-1 conv0, decoder with inter_conv refinement
    (flownet2 submodule models layout; consumed by the released
    FlowNet2 checkpoint under the "flownets_d." prefix)."""

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        out_conv0 = conv_block(x, 64, 3, 1, "conv0")
        out_conv1 = conv_block(out_conv0, 64, 3, 2, "conv1")
        out_conv1 = conv_block(out_conv1, 128, 3, 1, "conv1_1")
        out_conv2 = conv_block(out_conv1, 128, 3, 2, "conv2")
        out_conv2 = conv_block(out_conv2, 128, 3, 1, "conv2_1")
        out_conv3 = conv_block(out_conv2, 256, 3, 2, "conv3")
        out_conv3 = conv_block(out_conv3, 256, 3, 1, "conv3_1")
        out_conv4 = conv_block(out_conv3, 512, 3, 2, "conv4")
        out_conv4 = conv_block(out_conv4, 512, 3, 1, "conv4_1")
        out_conv5 = conv_block(out_conv4, 512, 3, 2, "conv5")
        out_conv5 = conv_block(out_conv5, 512, 3, 1, "conv5_1")
        out_conv6 = conv_block(out_conv5, 1024, 3, 2, "conv6")
        out_conv6 = conv_block(out_conv6, 1024, 3, 1, "conv6_1")

        flow6 = predict_flow(out_conv6, "predict_flow6")
        flow6_up = upsample_flow(flow6, "upsampled_flow6_to_5")
        out_deconv5 = deconv_block(out_conv6, 512, "deconv5")

        concat5 = jnp.concatenate((out_conv5, out_deconv5, flow6_up), -1)
        inter5 = inter_conv(concat5, 512, "inter_conv5")
        flow5 = predict_flow(inter5, "predict_flow5")
        flow5_up = upsample_flow(flow5, "upsampled_flow5_to_4")
        out_deconv4 = deconv_block(concat5, 256, "deconv4")

        concat4 = jnp.concatenate((out_conv4, out_deconv4, flow5_up), -1)
        inter4 = inter_conv(concat4, 256, "inter_conv4")
        flow4 = predict_flow(inter4, "predict_flow4")
        flow4_up = upsample_flow(flow4, "upsampled_flow4_to_3")
        out_deconv3 = deconv_block(concat4, 128, "deconv3")

        concat3 = jnp.concatenate((out_conv3, out_deconv3, flow4_up), -1)
        inter3 = inter_conv(concat3, 128, "inter_conv3")
        flow3 = predict_flow(inter3, "predict_flow3")
        flow3_up = upsample_flow(flow3, "upsampled_flow3_to_2")
        out_deconv2 = deconv_block(concat3, 64, "deconv2")

        concat2 = jnp.concatenate((out_conv2, out_deconv2, flow3_up), -1)
        inter2 = inter_conv(concat2, 64, "inter_conv2")
        flow2 = predict_flow(inter2, "predict_flow2")
        return flow2, flow3, flow4, flow5, flow6


class FlowNetFusion(nn.Module):
    """FlowNetFusion: fuses the CSS (large-displacement) and SD
    (small-displacement) flows at full resolution from an 11-channel
    input (img0, both flows, their norms, both warp-error norms)."""

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        out_conv0 = conv_block(x, 64, 3, 1, "conv0")
        out_conv1 = conv_block(out_conv0, 64, 3, 2, "conv1")
        out_conv1 = conv_block(out_conv1, 128, 3, 1, "conv1_1")
        out_conv2 = conv_block(out_conv1, 128, 3, 2, "conv2")
        out_conv2 = conv_block(out_conv2, 128, 3, 1, "conv2_1")

        flow2 = predict_flow(out_conv2, "predict_flow2")
        flow2_up = upsample_flow(flow2, "upsampled_flow2_to_1")
        out_deconv1 = deconv_block(out_conv2, 32, "deconv1")

        concat1 = jnp.concatenate((out_conv1, out_deconv1, flow2_up), -1)
        inter1 = inter_conv(concat1, 32, "inter_conv1")
        flow1 = predict_flow(inter1, "predict_flow1")
        flow1_up = upsample_flow(flow1, "upsampled_flow1_to_0")
        out_deconv0 = deconv_block(concat1, 16, "deconv0")

        concat0 = jnp.concatenate((out_conv0, out_deconv0, flow1_up), -1)
        inter0 = inter_conv(concat0, 16, "inter_conv0")
        return predict_flow(inter0, "predict_flow0")


class FlowNet2CSS(nn.Module):
    """The FlowNet2 cascade C -> S -> S (the stack used by the released
    FlowNet2 checkpoint, minus the small-displacement SD/fusion branch;
    sufficient for the large-displacement video regime this pipeline
    targets). Input: two images (B, H, W, 3) in [0, 1]; output: flow at
    full resolution, pixels."""

    rgb_mean: Tuple[float, float, float] = (0.411, 0.432, 0.45)
    div_flow: float = 20.0

    @nn.compact
    def __call__(self, im1, im2) -> jnp.ndarray:
        mean = jnp.asarray(self.rgb_mean, im1.dtype)
        return _css_cascade(im1 - mean, im2 - mean, self.div_flow)


def _up4(flow, scale):
    """x4 bilinear upsample of a 1/4-res flow map, scaled by the
    training-time flow normalization (FlowNet2's Upsample(4) glue)."""
    from ..models.layers import resize_bilinear

    h, w = flow.shape[1:3]
    return scale * resize_bilinear(
        flow, (4 * h, 4 * w), align_corners=False)


def _css_cascade(x1, x2, div_flow):
    """The C -> S -> S large-displacement stack on mean-subtracted
    inputs; returns full-resolution flow in pixels. Must run inside a
    compact module (instantiates flownetc / flownets_1 / flownets_2
    with the released checkpoint's module names)."""
    flow = _up4(FlowNetC(name="flownetc")(x1, x2)[0], div_flow)
    for name in ("flownets_1", "flownets_2"):
        warped = flow_warp(x2, flow)
        diff = channel_norm(x1 - warped)
        inp = jnp.concatenate((x1, x2, warped, flow / div_flow, diff), -1)
        flow = _up4(FlowNetS(name=name)(inp)[0], div_flow)
    return flow


class FlowNet2(nn.Module):
    """The complete FlowNet2: CSS (large displacement) + SD (small
    displacement) + fusion, matching the released ``flownet2.pth``
    checkpoint's structure and glue (the flownet2 submodule's FlowNet2
    forward; reference loads it at
    optical_flow_flownet2_homography.py:246-252).

    Input: two (B, H, W, 3) images in [0, 1], H and W divisible by 64;
    output: full-resolution flow in pixels."""

    rgb_mean: Tuple[float, float, float] = (0.411, 0.432, 0.45)
    div_flow: float = 20.0

    @nn.compact
    def __call__(self, im1, im2) -> jnp.ndarray:
        mean = jnp.asarray(self.rgb_mean, im1.dtype)
        x1 = im1 - mean
        x2 = im2 - mean

        # large-displacement branch
        css_flow = _css_cascade(x1, x2, self.div_flow)
        css_norm = channel_norm(css_flow)
        css_err = channel_norm(x1 - flow_warp(x2, css_flow))

        # small-displacement branch (note the / div_flow: SD was trained
        # with the inverse normalization, per the released checkpoint)
        sd_flow2 = FlowNetSD(name="flownets_d")(
            jnp.concatenate((x1, x2), -1))[0]
        sd_flow = _up4(sd_flow2, 1.0 / self.div_flow)
        sd_norm = channel_norm(sd_flow)
        sd_err = channel_norm(x1 - flow_warp(x2, sd_flow))

        fused_in = jnp.concatenate(
            (x1, sd_flow, css_flow, sd_norm, css_norm, sd_err, css_err), -1)
        return FlowNetFusion(name="flownetfusion")(fused_in)
