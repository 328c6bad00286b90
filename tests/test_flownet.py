"""FlowNet family: shapes, torch-twin parity for FlowNetS, warp/norm
op semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistent_depth_tpu.flow import flownet
from consistent_depth_tpu.models import torch_import

pytestmark = pytest.mark.slow  # compile-heavy


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


def _torch_flownet_helpers():
    import torch.nn as nn

    def conv(inp, out, k=3, s=1):
        return nn.Sequential(
            nn.Conv2d(inp, out, k, s, (k - 1) // 2, bias=True),
            nn.LeakyReLU(0.1, inplace=True))

    def deconv(inp, out):
        return nn.Sequential(
            nn.ConvTranspose2d(inp, out, 4, 2, 1, bias=True),
            nn.LeakyReLU(0.1, inplace=True))

    def i_conv(inp, out):
        return nn.Sequential(nn.Conv2d(inp, out, 3, 1, 1, bias=True))

    def predict(inp):
        return nn.Conv2d(inp, 2, 3, 1, 1)

    def upsample():
        import torch.nn as nn

        return nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)

    return conv, deconv, i_conv, predict, upsample


def test_flownetsd_torch_twin_parity():
    """FlowNetSD forward/import parity vs a torch twin in the flownet2
    submodule's layout (inter_conv refinement decoder)."""
    import torch
    import torch.nn as nn

    conv, deconv, i_conv, predict, upsample = _torch_flownet_helpers()

    class FlowNetSDTwin(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv0 = conv(6, 64)
            self.conv1 = conv(64, 64, s=2)
            self.conv1_1 = conv(64, 128)
            self.conv2 = conv(128, 128, s=2)
            self.conv2_1 = conv(128, 128)
            self.conv3 = conv(128, 256, s=2)
            self.conv3_1 = conv(256, 256)
            self.conv4 = conv(256, 512, s=2)
            self.conv4_1 = conv(512, 512)
            self.conv5 = conv(512, 512, s=2)
            self.conv5_1 = conv(512, 512)
            self.conv6 = conv(512, 1024, s=2)
            self.conv6_1 = conv(1024, 1024)
            self.deconv5 = deconv(1024, 512)
            self.deconv4 = deconv(1026, 256)
            self.deconv3 = deconv(770, 128)
            self.deconv2 = deconv(386, 64)
            self.inter_conv5 = i_conv(1026, 512)
            self.inter_conv4 = i_conv(770, 256)
            self.inter_conv3 = i_conv(386, 128)
            self.inter_conv2 = i_conv(194, 64)
            self.predict_flow6 = predict(1024)
            self.predict_flow5 = predict(512)
            self.predict_flow4 = predict(256)
            self.predict_flow3 = predict(128)
            self.predict_flow2 = predict(64)
            self.upsampled_flow6_to_5 = upsample()
            self.upsampled_flow5_to_4 = upsample()
            self.upsampled_flow4_to_3 = upsample()
            self.upsampled_flow3_to_2 = upsample()

        def forward(self, x):
            out_conv0 = self.conv0(x)
            out_conv1 = self.conv1_1(self.conv1(out_conv0))
            out_conv2 = self.conv2_1(self.conv2(out_conv1))
            out_conv3 = self.conv3_1(self.conv3(out_conv2))
            out_conv4 = self.conv4_1(self.conv4(out_conv3))
            out_conv5 = self.conv5_1(self.conv5(out_conv4))
            out_conv6 = self.conv6_1(self.conv6(out_conv5))
            flow6 = self.predict_flow6(out_conv6)
            flow6_up = self.upsampled_flow6_to_5(flow6)
            out_deconv5 = self.deconv5(out_conv6)
            concat5 = torch.cat((out_conv5, out_deconv5, flow6_up), 1)
            out_interconv5 = self.inter_conv5(concat5)
            flow5 = self.predict_flow5(out_interconv5)
            flow5_up = self.upsampled_flow5_to_4(flow5)
            out_deconv4 = self.deconv4(concat5)
            concat4 = torch.cat((out_conv4, out_deconv4, flow5_up), 1)
            out_interconv4 = self.inter_conv4(concat4)
            flow4 = self.predict_flow4(out_interconv4)
            flow4_up = self.upsampled_flow4_to_3(flow4)
            out_deconv3 = self.deconv3(concat4)
            concat3 = torch.cat((out_conv3, out_deconv3, flow4_up), 1)
            out_interconv3 = self.inter_conv3(concat3)
            flow3 = self.predict_flow3(out_interconv3)
            flow3_up = self.upsampled_flow3_to_2(flow3)
            out_deconv2 = self.deconv2(concat3)
            concat2 = torch.cat((out_conv2, out_deconv2, flow3_up), 1)
            out_interconv2 = self.inter_conv2(concat2)
            return self.predict_flow2(out_interconv2)

    torch.manual_seed(1)
    twin = FlowNetSDTwin().eval()
    model = flownet.FlowNetSD()
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)))
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = torch_import.state_dict_to_variables(sd, template)

    rng = np.random.default_rng(5)
    x = rng.random((1, 64, 64, 6)).astype(np.float32)
    with torch.no_grad():
        t_flow = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    j_flow = np.asarray(model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x))[0])
    np.testing.assert_allclose(
        j_flow.transpose(0, 3, 1, 2), t_flow, rtol=1e-4, atol=1e-5)


def test_flownetfusion_torch_twin_parity():
    import torch
    import torch.nn as nn

    conv, deconv, i_conv, predict, upsample = _torch_flownet_helpers()

    class FlowNetFusionTwin(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv0 = conv(11, 64)
            self.conv1 = conv(64, 64, s=2)
            self.conv1_1 = conv(64, 128)
            self.conv2 = conv(128, 128, s=2)
            self.conv2_1 = conv(128, 128)
            self.deconv1 = deconv(128, 32)
            self.deconv0 = deconv(162, 16)
            self.inter_conv1 = i_conv(162, 32)
            self.inter_conv0 = i_conv(82, 16)
            self.predict_flow2 = predict(128)
            self.predict_flow1 = predict(32)
            self.predict_flow0 = predict(16)
            self.upsampled_flow2_to_1 = upsample()
            self.upsampled_flow1_to_0 = upsample()

        def forward(self, x):
            out_conv0 = self.conv0(x)
            out_conv1 = self.conv1_1(self.conv1(out_conv0))
            out_conv2 = self.conv2_1(self.conv2(out_conv1))
            flow2 = self.predict_flow2(out_conv2)
            flow2_up = self.upsampled_flow2_to_1(flow2)
            out_deconv1 = self.deconv1(out_conv2)
            concat1 = torch.cat((out_conv1, out_deconv1, flow2_up), 1)
            out_interconv1 = self.inter_conv1(concat1)
            flow1 = self.predict_flow1(out_interconv1)
            flow1_up = self.upsampled_flow1_to_0(flow1)
            out_deconv0 = self.deconv0(concat1)
            concat0 = torch.cat((out_conv0, out_deconv0, flow1_up), 1)
            out_interconv0 = self.inter_conv0(concat0)
            return self.predict_flow0(out_interconv0)

    torch.manual_seed(2)
    twin = FlowNetFusionTwin().eval()
    model = flownet.FlowNetFusion()
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 11)))
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = torch_import.state_dict_to_variables(sd, template)

    rng = np.random.default_rng(6)
    x = rng.random((1, 32, 32, 11)).astype(np.float32)
    with torch.no_grad():
        t_flow = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    j_flow = np.asarray(model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x)))
    np.testing.assert_allclose(
        j_flow.transpose(0, 3, 1, 2), t_flow, rtol=1e-4, atol=1e-5)


def test_flownet2_full_end_to_end_shape():
    """The complete C+S+S+SD+fusion stack runs and produces finite
    full-resolution flow (checkpoint-structure smoke test)."""
    model = flownet.FlowNet2()
    rng = np.random.default_rng(7)
    im1 = jnp.asarray(rng.random((1, 64, 64, 3), np.float32).astype(np.float32))
    im2 = jnp.asarray(rng.random((1, 64, 64, 3), np.float32).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), im1, im2)
    params = variables["params"]
    # the released checkpoint's five module groups must all exist
    assert {"flownetc", "flownets_1", "flownets_2", "flownets_d",
            "flownetfusion"} <= set(params)
    flow = model.apply(variables, im1, im2)
    assert flow.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(flow)).all()
