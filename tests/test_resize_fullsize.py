"""Resize-matmul parity at the real monodepth2 feed size.

The separable interpolation matrices (models/layers.py) are
size-dependent; round 1 only tested toy sizes. This checks bicubic
down/up against torch F.interpolate at the production 1024x320 feed
(reference: monodepth/monodepth2_model.py:63-89) and the MiDaS-style
bilinear path at its 384-side feed.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from consistent_depth_tpu.models import layers

pytestmark = pytest.mark.slow  # compile-heavy


def _torch_resize(x_nhwc, out_hw, mode, align_corners):
    import torch
    import torch.nn.functional as F

    t = torch.tensor(x_nhwc.transpose(0, 3, 1, 2))
    y = F.interpolate(t, size=out_hw, mode=mode,
                      align_corners=align_corners)
    return y.numpy().transpose(0, 2, 3, 1)


@pytest.mark.slow
@pytest.mark.parametrize("in_hw,out_hw", [
    ((224, 384), (320, 1024)),   # monodepth2 feed resize
    ((320, 1024), (224, 384)),   # disparity back-resize
])
def test_bicubic_fullsize_torch_parity(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.random((1,) + in_hw + (3,)).astype(np.float32)
    ours = np.asarray(layers.resize_bicubic(jnp.asarray(x), out_hw,
                                            align_corners=False))
    ref = _torch_resize(x, out_hw, "bicubic", False)
    # atol covers fp32 reassociation noise on the 1024-wide contraction
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_bilinear_fullsize_torch_parity():
    rng = np.random.default_rng(1)
    x = rng.random((1, 96, 128, 8)).astype(np.float32)
    for out_hw, ac in (((224, 384), True), ((192, 256), False)):
        ours = np.asarray(layers.resize_bilinear(jnp.asarray(x), out_hw,
                                                 align_corners=ac))
        ref = _torch_resize(x, out_hw, "bilinear", ac)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
