"""monodepth2 + MiDaS v2 forward/import parity against torch twins."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistent_depth_tpu.models import torch_import

pytestmark = pytest.mark.slow  # compile-heavy


def _norm_rel(a, b):
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def test_monodepth2_forward_parity():
    import torch
    from torch_twins_extra import DepthDecoderTwin, ResnetEncoderTwin

    from consistent_depth_tpu.models.monodepth2 import Monodepth2Net

    torch.manual_seed(0)
    encoder = ResnetEncoderTwin().eval()
    decoder = DepthDecoderTwin(encoder.num_ch_enc).eval()

    model = Monodepth2Net()
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    # the twins' state_dicts already carry the encoder./decoder. prefixes
    sd = {k: v.detach().numpy() for k, v in encoder.state_dict().items()}
    sd.update(
        {k: v.detach().numpy() for k, v in decoder.state_dict().items()})
    variables = torch_import.state_dict_to_variables(sd, template)

    rng = np.random.default_rng(0)
    x = rng.random((2, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        feats = encoder(torch.tensor(x.transpose(0, 3, 1, 2)))
        t_out = decoder(feats)

    j_out = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(x), train=False)
    for s in range(4):
        a = np.asarray(j_out[s])[..., 0]
        b = t_out[("disp", s)].numpy()[:, 0]
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_monodepth2_adapter_feed_resize():
    """The adapter must resize to the feed size and back (reference:
    monodepth2_model.py:63-89), with depth = 1/disparity."""
    from consistent_depth_tpu.models.monodepth2 import Monodepth2Model

    model = Monodepth2Model(checkpoint="", seed=0, feed_size=(64, 96))
    images = jnp.asarray(
        np.random.default_rng(1).random((1, 2, 48, 80, 3), np.float32)
        .astype(np.float32))
    depth, _ = model.estimate_depth_pure(model.variables, images, train=False)
    assert depth.shape == (1, 2, 48, 80)
    assert np.all(np.asarray(depth) > 0)  # 1/sigmoid >= 1


@pytest.mark.slow
def test_midas_forward_parity():
    import torch
    from torch_twins_extra import MidasNetTwin

    from consistent_depth_tpu.models.midas_v2 import MidasNet

    torch.manual_seed(0)
    # small layer config (1 block per stage) keeps the 1-CPU test fast
    # while exercising the same code paths as the full 3-4-23-3 net
    twin = MidasNetTwin(layers=(1, 1, 1, 1)).eval()

    from consistent_depth_tpu.models import midas_v2 as mv
    import flax.linen as nn

    class SmallNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            from consistent_depth_tpu.models.layers import (
                TorchBatchNorm, conv, max_pool, resize_bilinear)
            from consistent_depth_tpu.models.resnet import bottleneck_layer

            class Enc(nn.Module):
                @nn.compact
                def __call__(self, x, train):
                    y = conv(64, 7, stride=2, padding=3, use_bias=False,
                             name="layer1_0")(x)
                    y = TorchBatchNorm(name="layer1_1")(y, train)
                    y = nn.relu(y)
                    y = max_pool(y, 3, 2, 1)
                    g, wpg = 32, 8
                    f1 = bottleneck_layer(
                        y, train, g * wpg, 256, 1, 1, g, "layer1_4", 64)
                    f2 = bottleneck_layer(
                        f1, train, g * wpg * 2, 512, 1, 2, g, "layer2", 256)
                    f3 = bottleneck_layer(
                        f2, train, g * wpg * 4, 1024, 1, 2, g, "layer3", 512)
                    f4 = bottleneck_layer(
                        f3, train, g * wpg * 8, 2048, 1, 2, g, "layer4", 1024)
                    return f1, f2, f3, f4

            f1, f2, f3, f4 = Enc(name="pretrained")(x, train)
            rn = [conv(256, 3, padding=1, use_bias=False,
                       name=f"scratch_layer{i}_rn")(f)
                  for i, f in ((1, f1), (2, f2), (3, f3), (4, f4))]
            p4 = mv.FeatureFusionBlock(256, name="scratch_refinenet4")(rn[3])
            p3 = mv.FeatureFusionBlock(
                256, name="scratch_refinenet3")(p4, rn[2])
            p2 = mv.FeatureFusionBlock(
                256, name="scratch_refinenet2")(p3, rn[1])
            p1 = mv.FeatureFusionBlock(
                256, name="scratch_refinenet1")(p2, rn[0])
            y = conv(128, 3, padding=1, name="scratch_output_conv_0")(p1)
            H, W = y.shape[1:3]
            y = resize_bilinear(y, (2 * H, 2 * W), align_corners=False)
            y = conv(32, 3, padding=1, name="scratch_output_conv_2")(y)
            y = nn.relu(y)
            y = conv(1, 1, name="scratch_output_conv_4")(y)
            return nn.relu(y)[..., 0]

    model = SmallNet()
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    sd = {k.replace("scratch.", "scratch_").replace(
        "scratch_output_conv.", "scratch_output_conv_"): v.detach().numpy()
        for k, v in twin.state_dict().items()}
    variables = torch_import.state_dict_to_variables(sd, template)

    rng = np.random.default_rng(2)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = twin(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    j_out = np.asarray(model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(x), train=False))
    assert j_out.shape == t_out.shape
    assert _norm_rel(j_out, t_out) < 1e-4


def test_midas_fullsize_import_structure():
    """Full ResNeXt-101 32x8d: a synthetic torch-layout state_dict with
    the twin's exact keys/shapes must import into the full flax MidasNet
    without any missing/extra/shape-mismatched leaves."""
    import torch
    from torch_twins_extra import MidasNetTwin

    from consistent_depth_tpu.models.midas_v2 import MidasNet

    with torch.device("meta"):
        twin = MidasNetTwin()
    model = MidasNet()
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False))
    sd = {k.replace("scratch.", "scratch_").replace(
        "scratch_output_conv.", "scratch_output_conv_"):
        np.zeros(tuple(v.shape), np.float32)
        for k, v in twin.state_dict().items()}
    # strict=True raises on any mismatch
    torch_import.state_dict_to_variables(sd, template)


def test_registry_exposes_all_backbones():
    from consistent_depth_tpu.models import get_depth_model, get_depth_model_list

    assert get_depth_model_list() == ["mc", "midas2", "monodepth2"]
    for name, (align, lr, lam) in {
        "mc": (16, 4e-4, 0.1),
        "midas2": (32, 1e-4, 1e-4),
        "monodepth2": (1, 4e-5, 1),
    }.items():
        cls = get_depth_model(name)
        assert cls.align == align
        assert cls.learning_rate == lr
        assert cls.lambda_view_baseline == lam
