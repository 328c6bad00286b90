"""Space-to-depth conv path: exact-parity vs the native XLA conv.

The s2d reformulation (models/layers.py) must be numerically equivalent
(up to fp reassociation) in forward AND backward, for every kernel size
used by the hourglass (3/5/7/11) at both s factors.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistent_depth_tpu.models import layers


@pytest.mark.parametrize("k", [3, 5, 7, 11])
@pytest.mark.parametrize("s", [2, 4])
def test_s2d_kernel_transform_exact(k, s):
    rng = np.random.default_rng(k * 10 + s)
    Ci, Co = 5, 3
    H, W = 24, 32
    w = jnp.asarray(rng.standard_normal((k, k, Ci, Co)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, H, W, Ci)), jnp.float32)
    p = (k - 1) // 2

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    w2, kk, pad = layers.s2d_kernel(w, s)
    y2 = jax.lax.conv_general_dilated(
        layers.space_to_depth(x, s), w2, (1, 1),
        [(pad, kk - 1 - pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = layers.depth_to_space(y2, s)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_torchconv_s2d_policy_engages_and_matches():
    """At production-like spatial size the policy must pick s2d, and the
    module output/gradients must match the native path."""
    H, W, Ci, k, Co = 112, 192, 8, 7, 4
    assert layers._s2d_factor(H, W, Ci, k, Co) > 0
    # small spatial extents must never engage
    assert layers._s2d_factor(56, 96, 64, 7, 16) == 0

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, H, W, Ci)) * 0.5, jnp.float32)
    mod = layers.conv(Co, k, padding=(k - 1) // 2)
    params = mod.init(jax.random.PRNGKey(0), x)

    def run(enabled):
        layers.set_s2d_enabled(enabled)
        try:
            def f(p, x):
                return jnp.sum(jnp.sin(mod.apply(p, x)))
            val, grads = jax.value_and_grad(f, argnums=(0, 1))(params, x)
            return val, grads
        finally:
            layers.set_s2d_enabled(True)

    v_ref, g_ref = run(False)
    v_s2d, g_s2d = run(True)
    np.testing.assert_allclose(float(v_s2d), float(v_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_s2d = jax.tree_util.tree_leaves(g_s2d)
    for a, b in zip(flat_s2d, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_torchconv_strided_path_unchanged():
    """Strided/asymmetric configs must take the native path and match a
    reference torch conv semantics check (zero padding)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    mod = layers.conv(6, 3, stride=2, padding=1)
    params = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(params, x)
    assert y.shape == (1, 8, 8, 6)


@pytest.mark.parametrize("gx_s,gw_s", [
    (-1, 0),   # grad-weight through the native conv, gx inherited
    (0, -1),   # grad-input as a native flipped-kernel conv
    (2, 0),    # re-policied s2d grad-input + native grad-weight
    (0, 0),    # both overridden to native
])
def test_backward_override_matches_autodiff(gx_s, gw_s, monkeypatch):
    """The per-direction backward formulation override (custom VJP in
    conv_compute) must reproduce plain autodiff's gradients exactly up
    to fp reassociation, for every override combination, on a shape
    where the forward policy engages s2d."""
    H, W, Ci, k, Co = 112, 192, 8, 7, 4
    pad = (k - 1) // 2
    assert layers._s2d_factor(H, W, Ci, k, Co) > 0

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, H, W, Ci)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, Ci, Co)) * 0.1, jnp.float32)

    def f(w_, x_):
        return jnp.sum(jnp.sin(
            layers.conv_compute(w_, None, x_, stride=1, padding=pad)))

    v_ref, g_ref = jax.value_and_grad(f, argnums=(0, 1))(w, x)

    monkeypatch.setattr(layers, "_bwd_policy", lambda *a: (gx_s, gw_s))
    v_ov, g_ov = jax.value_and_grad(f, argnums=(0, 1))(w, x)

    # identical forward formulation -> identical value
    np.testing.assert_allclose(float(v_ov), float(v_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ov),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-4)


# measured backward table (tools/bwd_mxu_bench.py, v5e bf16, 2026-08-19)
# for every hourglass class where the forward policy reformulates:
# tag: (H, W, C_in, k, C_out, s_fwd, gx_native, gx_s2d, gw_native,
#       gw_s2d) — ms per instance, gw columns ct-varier-corrected
_BWD_MEASURED = {
    "stem7": (224, 384, 3, 7, 128, 4, 5.677, 1.607, 0.462, 1.536),
    "A.3": (224, 384, 64, 3, 16, 2, 0.443, 0.711, 0.497, 1.391),
    "A.7": (224, 384, 64, 7, 16, 4, 1.752, 1.394, 1.702, 2.142),
    "A.11": (224, 384, 64, 11, 16, 2, 7.954, 2.111, 4.032, 2.550),
    "B.3": (112, 192, 32, 3, 32, 2, 0.161, 0.157, 0.097, 0.196),
    "B.5": (112, 192, 32, 5, 32, 2, 0.287, 0.157, 0.253, 0.197),
    "B.7": (112, 192, 32, 7, 32, 2, 0.478, 0.288, 0.497, 0.334),
    "BC.3": (112, 192, 64, 3, 32, 2, 0.150, 0.222, 0.111, 0.291),
    "BC.7": (112, 192, 64, 7, 32, 2, 0.453, 0.470, 0.476, 0.557),
    "BC.11": (112, 192, 64, 11, 32, 2, 1.353, 0.837, 1.123, 0.933),
    "BB.5": (112, 192, 64, 5, 32, 2, 0.316, 0.222, 0.260, 0.288),
    "pred3": (224, 384, 64, 3, 1, 2, 0.333, 0.291, 0.306, 0.441),
}


def test_backward_policy_choices_near_measured_best():
    """_bwd_policy's rule must pick within 10% of the measured best
    formulation for every reformulated hourglass class (the rule trades
    tiny losses on marginal classes — B.3 gx, capped below — for the
    unambiguous 1.3-3.5x wins)."""
    for tag, (H, W, Ci, k, Co, s, gxn, gxs, gwn, gws) in \
            _BWD_MEASURED.items():
        assert layers._s2d_factor(H, W, Ci, k, Co) == s, tag
        gx_s, gw_s = layers._bwd_policy(H, W, Ci, k, Co, s)
        got_gx = gxn if gx_s == 0 else gxs
        got_gw = gwn if gw_s == 0 else gws
        assert got_gx <= 1.10 * min(gxn, gxs), (tag, "gx")
        assert got_gw <= 1.10 * min(gwn, gws), (tag, "gw")


def test_backward_policy_inherits_when_forward_native():
    """No override when the forward runs the native conv — autodiff of
    the native conv already IS the native backward."""
    assert layers._bwd_policy(56, 96, 32, 7, 64, 0) == (-1, -1)


def test_backward_override_under_jit_scan(monkeypatch):
    """The custom-VJP conv must compose with the engine's program
    shape: value_and_grad of a lax.scan-wrapped loss under jit."""
    monkeypatch.setattr(layers, "_bwd_policy", lambda *a: (2, 0))
    H, W, Ci, k, Co = 112, 192, 4, 3, 4
    pad = (k - 1) // 2
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, H, W, Ci)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, Ci, Co)) * 0.1, jnp.float32)

    @jax.jit
    def loss(w_, x_):
        def body(c, _):
            y = layers.conv_compute(w_, None, x_ + c, stride=1,
                                    padding=pad)
            return c + 0.0, jnp.mean(y)
        _, ys = jax.lax.scan(body, jnp.float32(0), None, length=3)
        return jnp.sum(ys)

    v, g = jax.value_and_grad(loss)(w, x)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()

    monkeypatch.setattr(layers, "_bwd_policy", lambda *a: (-1, -1))
    v2, g2 = jax.value_and_grad(loss.__wrapped__)(w, x)
    np.testing.assert_allclose(float(v), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2),
                               rtol=5e-4, atol=1e-4)
