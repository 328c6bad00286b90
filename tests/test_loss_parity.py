"""Consistency/joint loss parity against the torch reference oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistent_depth_tpu.ops.losses import (
    LossWeights, consistency_loss, joint_loss, weighted_mean_loss,
)


def _random_pose(rng):
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.standard_normal((3, 1)) * 0.2
    return np.concatenate([Q, t], axis=1).astype(np.float32)


def _make_batch(rng, B=4, H=10, W=14):
    intr = np.tile(
        np.array([[W * 1.3, W * 1.25, (W - 1) / 2, (H - 1) / 2]],
                 dtype=np.float32), (B * 2, 1)).reshape(B, 2, 4)
    extr = np.stack(
        [_random_pose(rng) for _ in range(B * 2)]).reshape(B, 2, 3, 4)
    depths = (0.7 + rng.random((B, 2, H, W))).astype(np.float32)
    flows = (rng.standard_normal((B, 2, H, W, 2)) * 2).astype(np.float32)
    masks = (rng.random((B, 2, H, W)) > 0.3).astype(np.float32)
    return intr, extr, depths, flows, masks


def _reference_loss(intr, extr, depths, flows, masks,
                    lam_vb, lam_rp, reference_root):
    import torch
    from loss.consistency_loss import ConsistencyLoss

    class Opt:
        lambda_view_baseline = lam_vb
        lambda_reprojection = lam_rp

    crit = ConsistencyLoss(Opt())
    metadata = {
        "extrinsics": torch.tensor(extr),
        "intrinsics": torch.tensor(intr),
        "geometry_consistency": {
            "flows": [
                torch.tensor(flows[:, k].transpose(0, 3, 1, 2))
                for k in range(2)
            ],
            "masks": [
                torch.tensor(masks[:, k][:, None]) for k in range(2)
            ],
        },
    }
    loss, batch_losses = crit(torch.tensor(depths), metadata)
    return (
        float(loss),
        {k: v.detach().numpy() for k, v in batch_losses.items()},
    )


@pytest.mark.parametrize("lam_vb,lam_rp", [(0.1, 1.0), (0.0, 1.0), (1.0, 0.0)])
def test_consistency_loss_matches_reference(reference_root, lam_vb, lam_rp):
    rng = np.random.default_rng(7)
    intr, extr, depths, flows, masks = _make_batch(rng)

    weights = LossWeights(lambda_view_baseline=lam_vb,
                          lambda_reprojection=lam_rp)
    ours_scalar, ours_batch = jax.jit(
        lambda *a: consistency_loss(*a, weights=weights)
    )(jnp.asarray(depths), jnp.asarray(intr), jnp.asarray(extr),
      jnp.asarray(flows), jnp.asarray(masks))

    ref_scalar, ref_batch = _reference_loss(
        intr, extr, depths, flows, masks, lam_vb, lam_rp, reference_root)

    np.testing.assert_allclose(float(ours_scalar), ref_scalar,
                               rtol=2e-4, atol=1e-5)
    for k in ("reprojection", "disparity"):
        np.testing.assert_allclose(
            np.asarray(ours_batch[k]), ref_batch[k], rtol=2e-4, atol=1e-5)


def test_weighted_mean_zero_mask():
    x = jnp.ones((2, 4, 4))
    w = jnp.zeros((2, 4, 4))
    out = weighted_mean_loss(x, w)
    # zero mask -> normalized by eps clamp -> 0-weighted sum = 0
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_valid_padding_mask():
    rng = np.random.default_rng(11)
    intr, extr, depths, flows, masks = _make_batch(rng, B=4)
    weights = LossWeights()
    args = (jnp.asarray(depths), jnp.asarray(intr), jnp.asarray(extr),
            jnp.asarray(flows), jnp.asarray(masks))
    # full batch of 4 with last 2 marked invalid == first-2 batch
    s_sub, _ = consistency_loss(*[a[:2] for a in args], weights=weights)
    s_pad, batch = consistency_loss(
        *args, weights=weights, valid=jnp.array([1.0, 1.0, 0.0, 0.0]))
    np.testing.assert_allclose(float(s_pad), float(s_sub), rtol=1e-5)
    assert np.all(np.asarray(batch["reprojection"][2:]) == 0)


def test_joint_loss_with_parameter_term(reference_root):
    rng = np.random.default_rng(13)
    intr, extr, depths, flows, masks = _make_batch(rng, B=2)
    params = {"w": jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32))}
    params_init = {"w": jnp.asarray(
        rng.standard_normal((3, 3)).astype(np.float32))}

    weights = LossWeights(lambda_parameter=0.5)
    loss, batch = joint_loss(
        jnp.asarray(depths), jnp.asarray(intr), jnp.asarray(extr),
        jnp.asarray(flows), jnp.asarray(masks), weights,
        params=params, params_init=params_init)

    expected_p = 0.5 * float(
        np.sum(np.abs(np.asarray(params["w"]) - np.asarray(params_init["w"]))))
    np.testing.assert_allclose(
        float(batch["parameter_loss"][0, 0]), expected_p, rtol=1e-6)
    ref_scalar, _ = _reference_loss(
        intr, extr, depths, flows, masks, 0.1, 1.0, reference_root)
    np.testing.assert_allclose(
        float(loss), ref_scalar + expected_p, rtol=2e-4, atol=1e-5)
