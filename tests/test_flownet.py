"""FlowNet family: shapes, torch-twin parity for FlowNetS, warp/norm
op semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistent_depth_tpu.flow import flownet
from consistent_depth_tpu.models import torch_import


def test_flow_warp_semantics():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4, 1))
    # shift right by 1: output[x] = img[x+1]; rightmost reads out -> 0
    flow = jnp.ones((1, 3, 4, 2)) * jnp.asarray([1.0, 0.0])
    out = np.asarray(flownet.flow_warp(img, flow))[0, :, :, 0]
    expect = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.testing.assert_allclose(out[:, :3], expect[:, 1:])
    np.testing.assert_allclose(out[:, 3], 0.0)


def test_channel_norm():
    x = jnp.asarray([[[[3.0, 4.0]]]])
    assert float(flownet.channel_norm(x)[0, 0, 0, 0]) == pytest.approx(5.0)


def test_flownets_shapes():
    model = flownet.FlowNetS()
    x = jnp.zeros((1, 64, 128, 12))
    variables = model.init(jax.random.PRNGKey(0), x)
    flows = model.apply(variables, x)
    assert flows[0].shape == (1, 16, 32, 2)   # 1/4 res
    assert flows[4].shape == (1, 1, 2, 2) or flows[4].shape[3] == 2


def test_flownetc_shapes():
    model = flownet.FlowNetC(max_displacement=8, corr_stride=2)
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, x)
    flows = model.apply(variables, x, x)
    assert flows[0].shape == (1, 16, 32, 2)


def test_flownet2css_end_to_end_shape():
    model = flownet.FlowNet2CSS()
    rng = np.random.default_rng(0)
    im1 = jnp.asarray(rng.random((1, 64, 64, 3), np.float32).astype(np.float32))
    im2 = jnp.asarray(rng.random((1, 64, 64, 3), np.float32).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), im1, im2)
    flow = model.apply(variables, im1, im2)
    assert flow.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_flownets_torch_twin_parity():
    """Forward + weight-import parity against a torch FlowNetS twin
    (flownet2-pytorch layout: conv Sequential(Conv2d, LeakyReLU))."""
    import torch
    import torch.nn as nn

    def conv(inp, out, k=3, s=1):
        return nn.Sequential(
            nn.Conv2d(inp, out, k, s, (k - 1) // 2, bias=True),
            nn.LeakyReLU(0.1, inplace=True))

    def deconv(inp, out):
        return nn.Sequential(
            nn.ConvTranspose2d(inp, out, 4, 2, 1, bias=True),
            nn.LeakyReLU(0.1, inplace=True))

    class FlowNetSTwin(nn.Module):
        def __init__(self, input_channels=12):
            super().__init__()
            self.conv1 = conv(input_channels, 64, 7, 2)
            self.conv2 = conv(64, 128, 5, 2)
            self.conv3 = conv(128, 256, 5, 2)
            self.conv3_1 = conv(256, 256)
            self.conv4 = conv(256, 512, 3, 2)
            self.conv4_1 = conv(512, 512)
            self.conv5 = conv(512, 512, 3, 2)
            self.conv5_1 = conv(512, 512)
            self.conv6 = conv(512, 1024, 3, 2)
            self.conv6_1 = conv(1024, 1024)
            self.deconv5 = deconv(1024, 512)
            self.deconv4 = deconv(1026, 256)
            self.deconv3 = deconv(770, 128)
            self.deconv2 = deconv(386, 64)
            self.predict_flow6 = nn.Conv2d(1024, 2, 3, 1, 1)
            self.predict_flow5 = nn.Conv2d(1026, 2, 3, 1, 1)
            self.predict_flow4 = nn.Conv2d(770, 2, 3, 1, 1)
            self.predict_flow3 = nn.Conv2d(386, 2, 3, 1, 1)
            self.predict_flow2 = nn.Conv2d(194, 2, 3, 1, 1)
            self.upsampled_flow6_to_5 = nn.ConvTranspose2d(2, 2, 4, 2, 1,
                                                           bias=False)
            self.upsampled_flow5_to_4 = nn.ConvTranspose2d(2, 2, 4, 2, 1,
                                                           bias=False)
            self.upsampled_flow4_to_3 = nn.ConvTranspose2d(2, 2, 4, 2, 1,
                                                           bias=False)
            self.upsampled_flow3_to_2 = nn.ConvTranspose2d(2, 2, 4, 2, 1,
                                                           bias=False)

        def forward(self, x):
            out_conv1 = self.conv1(x)
            out_conv2 = self.conv2(out_conv1)
            out_conv3 = self.conv3_1(self.conv3(out_conv2))
            out_conv4 = self.conv4_1(self.conv4(out_conv3))
            out_conv5 = self.conv5_1(self.conv5(out_conv4))
            out_conv6 = self.conv6_1(self.conv6(out_conv5))
            flow6 = self.predict_flow6(out_conv6)
            flow6_up = self.upsampled_flow6_to_5(flow6)
            out_deconv5 = self.deconv5(out_conv6)
            concat5 = torch.cat((out_conv5, out_deconv5, flow6_up), 1)
            flow5 = self.predict_flow5(concat5)
            flow5_up = self.upsampled_flow5_to_4(flow5)
            out_deconv4 = self.deconv4(concat5)
            concat4 = torch.cat((out_conv4, out_deconv4, flow5_up), 1)
            flow4 = self.predict_flow4(concat4)
            flow4_up = self.upsampled_flow4_to_3(flow4)
            out_deconv3 = self.deconv3(concat4)
            concat3 = torch.cat((out_conv3, out_deconv3, flow4_up), 1)
            flow3 = self.predict_flow3(concat3)
            flow3_up = self.upsampled_flow3_to_2(flow3)
            out_deconv2 = self.deconv2(concat3)
            concat2 = torch.cat((out_conv2, out_deconv2, flow3_up), 1)
            return self.predict_flow2(concat2)

    torch.manual_seed(0)
    twin = FlowNetSTwin().eval()
    model = flownet.FlowNetS()
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 12)))
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = torch_import.state_dict_to_variables(sd, template)

    rng = np.random.default_rng(3)
    x = rng.random((1, 64, 64, 12)).astype(np.float32)
    with torch.no_grad():
        t_flow = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    j_flow = np.asarray(model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x))[0])
    np.testing.assert_allclose(
        j_flow.transpose(0, 3, 1, 2), t_flow, rtol=1e-4, atol=1e-5)
