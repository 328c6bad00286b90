"""The packed-gather fast sampler must match the plain 4-gather
reference formulation in value AND gradients (data and positions),
including border clamping, out-of-range coords, and NaN propagation."""

import numpy as np

import jax
import jax.numpy as jnp

from consistent_depth_tpu.ops import resample


def _setup(seed=0, H=12, W=18, C=2):
    rng = np.random.default_rng(seed)
    data = jnp.asarray(rng.random((H, W, C)), jnp.float32)
    x = jnp.asarray(rng.random((7, 9)) * (W + 8) - 4, jnp.float32)
    y = jnp.asarray(rng.random((7, 9)) * (H + 8) - 4, jnp.float32)
    return data, x, y


def test_forward_matches_reference():
    data, x, y = _setup()
    fast = np.asarray(resample.bilinear_sample_pixels(data, x, y))
    ref = np.asarray(resample.bilinear_sample_pixels_reference(data, x, y))
    np.testing.assert_allclose(fast, ref, rtol=1e-6, atol=1e-6)


def test_gradients_match_reference():
    data, x, y = _setup(seed=1)

    def loss(fn, d, xx, yy):
        return jnp.sum(jnp.sin(fn(d, xx, yy)) * 1.7)

    g_fast = jax.grad(
        lambda d, xx, yy: loss(resample.bilinear_sample_pixels, d, xx, yy),
        argnums=(0, 1, 2))(data, x, y)
    g_ref = jax.grad(
        lambda d, xx, yy: loss(
            resample.bilinear_sample_pixels_reference, d, xx, yy),
        argnums=(0, 1, 2))(data, x, y)
    for a, b, name in zip(g_fast, g_ref, ("data", "x", "y")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=f"grad mismatch for {name}")


def test_integer_coords_exact():
    data, _, _ = _setup(seed=2)
    H, W, _ = data.shape
    xs, ys = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    out = np.asarray(resample.bilinear_sample_pixels(data, xs, ys))
    np.testing.assert_allclose(out, np.asarray(data), rtol=1e-6, atol=1e-6)


def test_nan_coords_propagate():
    data, x, y = _setup(seed=3)
    x = x.at[0, 0].set(jnp.nan)
    out = np.asarray(resample.bilinear_sample_pixels(data, x, y))
    assert np.isnan(out[0, 0]).all()
    assert np.isfinite(out[1:]).all()


def test_tiny_image_fallback():
    rng = np.random.default_rng(4)
    data = jnp.asarray(rng.random((1, 5, 1)), jnp.float32)
    x = jnp.asarray([[0.5, 3.9]], jnp.float32)
    y = jnp.zeros((1, 2), jnp.float32)
    out = np.asarray(resample.bilinear_sample_pixels(data, x, y))
    ref = np.asarray(
        resample.bilinear_sample_pixels_reference(data, x, y))
    np.testing.assert_allclose(out, ref)


def test_splat_matmul_backward_matches_scatter():
    """The bf16 matmul-splat d_data backward (production path under the
    engine's bf16 policy) must match the exact scatter backward to
    bf16-contribution tolerance, including border-clamped points."""
    rng = np.random.default_rng(5)
    H, W = 20, 24
    data = jnp.asarray(rng.random((H, W, 1)), jnp.float32)
    x = jnp.asarray(rng.random((13, 17)) * (W + 6) - 3, jnp.float32)
    y = jnp.asarray(rng.random((13, 17)) * (H + 6) - 3, jnp.float32)

    def loss(d):
        return jnp.sum(jnp.sin(resample.bilinear_sample_pixels(d, x, y)) * 1.7)

    g_scatter = np.asarray(jax.grad(loss)(data))
    try:
        resample.set_splat_enabled(True)
        g_splat = np.asarray(jax.grad(loss)(data))
    finally:
        resample.set_splat_enabled(False)
    np.testing.assert_allclose(g_splat, g_scatter, rtol=2e-2, atol=2e-3)
    # sanity: the gradient is not degenerate
    assert np.abs(g_scatter).max() > 0.1


def test_border_exact_position_gradient_zero():
    """At exactly x == W-1 (or y == H-1) the reference formulation has
    identical corners (x0 == x1 == W-1), so d/dx == 0; the fast path's
    x0 <= W-2 convention must not leak a one-sided difference there
    (regression: identity warps of border pixels)."""
    rng = np.random.default_rng(6)
    H, W = 9, 11
    data = jnp.asarray(rng.random((H, W, 1)), jnp.float32)
    x = jnp.asarray([[W - 1.0, 3.2]], jnp.float32)
    y = jnp.asarray([[H - 1.0, 4.7]], jnp.float32)

    for fn in (resample.bilinear_sample_pixels,
               resample.bilinear_sample_pixels_reference):
        gx, gy = jax.grad(
            lambda xx, yy: jnp.sum(data.sum() * 0 + fn(data, xx, yy)),
            argnums=(0, 1))(x, y)
        assert float(gx[0, 0]) == 0.0, fn.__name__
        assert float(gy[0, 0]) == 0.0, fn.__name__
