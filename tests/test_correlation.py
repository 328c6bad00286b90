"""Cost-volume op: jnp reference semantics + Pallas kernel parity
(interpret mode on CPU; the compiled path runs on real TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from consistent_depth_tpu.flow.correlation import correlation, correlation_pallas


def _naive(f1, f2, max_disp, stride):
    B, H, W, C = f1.shape
    r = max_disp // stride
    D = 2 * r + 1
    out = np.zeros((B, H, W, D * D), np.float32)
    f2p = np.pad(f2, ((0, 0), (max_disp, max_disp),
                      (max_disp, max_disp), (0, 0)))
    for b in range(B):
        for y in range(H):
            for x in range(W):
                k = 0
                for dy in range(-r, r + 1):
                    for dx in range(-r, r + 1):
                        yy = y + max_disp + dy * stride
                        xx = x + max_disp + dx * stride
                        out[b, y, x, k] = np.mean(
                            f1[b, y, x] * f2p[b, yy, xx])
                        k += 1
    return out


def test_correlation_matches_naive():
    rng = np.random.default_rng(0)
    f1 = rng.standard_normal((1, 8, 10, 4)).astype(np.float32)
    f2 = rng.standard_normal((1, 8, 10, 4)).astype(np.float32)
    ours = np.asarray(correlation(jnp.asarray(f1), jnp.asarray(f2),
                                  max_displacement=4, stride=2))
    naive = _naive(f1, f2, 4, 2)
    np.testing.assert_allclose(ours, naive, rtol=1e-5, atol=1e-6)


def test_pallas_matches_jnp_interpret():
    rng = np.random.default_rng(1)
    f1 = rng.standard_normal((2, 16, 12, 8)).astype(np.float32)
    f2 = rng.standard_normal((2, 16, 12, 8)).astype(np.float32)
    ref = np.asarray(correlation(jnp.asarray(f1), jnp.asarray(f2),
                                 max_displacement=4, stride=2))
    pal = np.asarray(correlation_pallas(
        jnp.asarray(f1), jnp.asarray(f2),
        max_displacement=4, stride=2, block_h=4, interpret=True))
    np.testing.assert_allclose(pal, ref, rtol=1e-5, atol=1e-6)
