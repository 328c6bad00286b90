"""Parity tests for the fused Pallas s2d conv (ops/s2d_conv.py) and its
custom-VJP integration (models/layers.py::_conv_pallas).

On the CPU test backend the kernel body runs in Pallas interpret mode —
the same program the TPU compiles via Mosaic. The contraction is
mathematically identical to the XLA s2d path (f32 tap accumulation), so
f32 parity is tight.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistent_depth_tpu.models import layers as L
from consistent_depth_tpu.ops.s2d_conv import s2d_conv_pallas


def _ref_conv(x, w):
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [((k - 1) // 2, (k - 1) // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize(
    "H,W,Ci,k,Co,s,split",
    [
        (16, 32, 5, 7, 4, 2, 1),
        (32, 32, 3, 7, 8, 4, 2),
        (16, 16, 4, 11, 2, 2, 1),
        (32, 64, 4, 5, 6, 2, 3),
    ])
def test_forward_parity(H, W, Ci, k, Co, s, split):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, H, W, Ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, Ci, Co)) * 0.1, jnp.float32)
    ref = _ref_conv(x, w)
    got = s2d_conv_pallas(x, w, s=s, block_h=2, co_split=split)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_custom_vjp_matches_autodiff():
    """Gradients through the integrated _conv_pallas (fused forward,
    pallas grad-input, XLA grad-weight) must match plain autodiff of
    the native conv."""
    rng = np.random.default_rng(1)
    H, W, Ci, k, Co, s = 16, 32, 6, 7, 4, 2
    p = (k - 1) // 2
    x = jnp.asarray(rng.standard_normal((2, H, W, Ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, Ci, Co)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.standard_normal((2, H, W, Co)), jnp.float32)

    def loss_ref(w_, x_):
        return jnp.sum(_ref_conv(x_, w_) * ct)

    L.set_pallas_s2d("force")
    try:
        # block_h=8 requires H % (s*8) == 0 -> H=16, s=2 fits exactly
        def loss_pallas(w_, x_):
            return jnp.sum(L._conv_pallas((s, -1, -1, p), w_, x_) * ct)

        y_ref = _ref_conv(x, w)
        y_pal = L._conv_pallas((s, -1, -1, p), w, x)
        np.testing.assert_allclose(
            np.asarray(y_pal), np.asarray(y_ref), rtol=2e-5, atol=2e-5)

        gw_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(w, x)
        gw_p, gx_p = jax.grad(loss_pallas, argnums=(0, 1))(w, x)
        np.testing.assert_allclose(
            np.asarray(gx_p), np.asarray(gx_r), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(gw_p), np.asarray(gw_r), rtol=2e-4, atol=2e-4)
    finally:
        L.set_pallas_s2d(False)


def test_gw_native_exception_path():
    """gw_s = 0 (native grad-weight, the s_fwd=4 / k=3 measured rule)
    through the pallas wrapper."""
    rng = np.random.default_rng(2)
    H, W, Ci, k, Co, s = 32, 32, 3, 7, 4, 4
    p = (k - 1) // 2
    x = jnp.asarray(rng.standard_normal((1, H, W, Ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, Ci, Co)) * 0.1, jnp.float32)

    def loss_ref(w_, x_):
        return jnp.mean(jnp.square(_ref_conv(x_, w_)))

    L.set_pallas_s2d("force")
    try:
        def loss_pallas(w_, x_):
            return jnp.mean(jnp.square(L._conv_pallas((s, -1, 0, p), w_, x_)))

        gw_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(w, x)
        gw_p, gx_p = jax.grad(loss_pallas, argnums=(0, 1))(w, x)
        np.testing.assert_allclose(
            np.asarray(gx_p), np.asarray(gx_r), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(gw_p), np.asarray(gw_r), rtol=2e-4, atol=2e-4)
    finally:
        L.set_pallas_s2d(False)
