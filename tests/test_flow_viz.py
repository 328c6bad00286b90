"""The batched device flow renderer must match the numpy reference
implementation (which itself replaces the reference's flowlib)."""

import numpy as np

import jax.numpy as jnp

from consistent_depth_tpu.ops import flow_viz


def test_flow_to_image_jnp_matches_numpy():
    rng = np.random.default_rng(0)
    flows = (rng.standard_normal((3, 17, 23, 2)) * 5).astype(np.float32)
    flows[1] *= 100.0                      # different per-image maxrad
    flows[2, 3, 4] = np.array([2e7, 0.0])  # unknown-flow threshold

    batched = np.asarray(flow_viz.flow_to_image_jnp(jnp.asarray(flows)))
    for b in range(flows.shape[0]):
        ref = flow_viz.flow_to_image(flows[b].copy())
        # f32 vs f64 arithmetic can flip floor() by one count
        diff = np.abs(batched[b].astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, (b, diff.max())
        assert np.mean(diff > 0) < 0.02


def test_flow_to_image_jnp_nan():
    flows = np.zeros((1, 4, 4, 2), np.float32)
    flows[0, 1, 1] = np.nan
    img = np.asarray(flow_viz.flow_to_image_jnp(jnp.asarray(flows)))
    assert np.isfinite(img).all()
