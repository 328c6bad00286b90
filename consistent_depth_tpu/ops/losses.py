"""Geometric consistency losses — pure, jit-compiled, vmapped over the
frame-pair batch.

Numerics match the reference (loss/consistency_loss.py, loss/joint_loss.py,
loss/parameter_loss.py): per frame pair, in both directions,

- reprojection loss: mask-weighted mean of the screen-space L2 distance
  between the flow-matched pixel and the depth-reprojected pixel;
- disparity loss: mean-focal-scaled mask-weighted mean of the 1/z
  difference between reprojected points and the target frame's own
  points sampled at the matched pixel.

Design departures from the reference (TPU-first, not semantic):

- loss over a *padded static-shape* batch with a ``valid`` sample mask
  (reference: dynamic last-batch, depth_fine_tuning.py:264-283);
- the NaN-skip becomes a masked update in the train step rather than a
  host-side ``continue``;
- everything is a pure function of ``(depths, batch)`` so the whole
  chain fuses under one jit.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import geometry
from .resample import sample_uv


class LossWeights(NamedTuple):
    """Static loss hyperparameters (reference: loss/loss_params.py)."""

    lambda_view_baseline: float = 0.1
    lambda_reprojection: float = 1.0
    lambda_parameter: float = 0.0


def weighted_mean_loss(
    x: jnp.ndarray, weights: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """Per-sample weighted mean with weights normalized to sum 1
    (reference: loss/consistency_loss.py:73-89).

    Args:
        x, weights: (B, ...) with matching shapes
    Returns:
        (B,)
    """
    B = x.shape[0]
    w = weights.reshape(B, -1)
    w_sum = jnp.clip(jnp.sum(w, axis=-1, keepdims=True), min=eps)
    return jnp.sum((w / w_sum) * x.reshape(B, -1), axis=-1)


def weighted_mse_loss(x, target, weights, eps: float = 1e-6):
    """(B, H, W, C) inputs, (B, H, W) weights -> (B,) of weighted mean
    squared error summed over channels."""
    sq = jnp.sum((x - target) ** 2, axis=-1)
    return weighted_mean_loss(sq, weights, eps)


def weighted_rmse_loss(x, target, weights, eps: float = 1e-6):
    diff = jnp.linalg.norm(x - target, axis=-1)
    return weighted_mean_loss(diff, weights, eps)


def geometry_consistency_loss(
    points_cam: jnp.ndarray,
    intrinsics: jnp.ndarray,
    extrinsics: jnp.ndarray,
    pixels: jnp.ndarray,
    flows: jnp.ndarray,
    masks: jnp.ndarray,
    weights: LossWeights,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Pairwise geometric consistency (reference:
    loss/consistency_loss.py:98-208).

    Args:
        points_cam: (B, 2, H, W, 3) camera-space points per frame
        intrinsics: (B, 2, 4)
        extrinsics: (B, 2, 3, 4)
        pixels:     (H, W, 2)
        flows:      (B, 2, H, W, 2) flow from frame k to frame 1-k, pixels
        masks:      (B, 2, H, W) valid-correspondence masks in {0, 1}

    Returns:
        (mean loss over batch, {"reprojection": (B,), "disparity": (B,)})
    """
    B = points_cam.shape[0]
    dtype = points_cam.dtype

    reproj_losses = []
    disp_losses = []
    for k in (0, 1):
        j = 1 - k
        points_ref = points_cam[:, k]
        points_tgt_own = points_cam[:, j]

        points_cam_tgt = geometry.reproject_points(
            points_ref, extrinsics[:, k], extrinsics[:, j]
        )
        matched_pixels_tgt = pixels + flows[:, k]
        pixels_tgt = geometry.project(points_cam_tgt, intrinsics[:, j])

        if weights.lambda_reprojection > 0:
            reproj_dist = jnp.linalg.norm(
                pixels_tgt - matched_pixels_tgt, axis=-1
            )
            reproj_losses.append(
                weighted_mean_loss(jnp.abs(reproj_dist), masks[:, k])
            )

        if weights.lambda_view_baseline > 0:
            # global scalar mean of (fx, fy) over the batch, as in the
            # reference (consistency_loss.py:178)
            f = jnp.mean(geometry.focal_length(intrinsics[:, k]))
            warped_tgt_z = sample_uv(
                points_tgt_own[..., -1:], matched_pixels_tgt
            )[..., 0]
            disp_diff = (
                1.0 / points_cam_tgt[..., -1] - 1.0 / warped_tgt_z
            )
            disp_losses.append(
                f * weighted_mean_loss(jnp.abs(disp_diff), masks[:, k])
            )

    if reproj_losses:
        reproj_loss = weights.lambda_reprojection * jnp.mean(
            jnp.stack(reproj_losses, axis=-1), axis=-1
        )
    else:
        reproj_loss = jnp.zeros((B,), dtype)
    if disp_losses:
        disp_loss = weights.lambda_view_baseline * jnp.mean(
            jnp.stack(disp_losses, axis=-1), axis=-1
        )
    else:
        disp_loss = jnp.zeros((B,), dtype)

    batch_losses = {"reprojection": reproj_loss, "disparity": disp_loss}
    return jnp.mean(reproj_loss + disp_loss), batch_losses


def consistency_loss(
    depths: jnp.ndarray,
    intrinsics: jnp.ndarray,
    extrinsics: jnp.ndarray,
    flows: jnp.ndarray,
    masks: jnp.ndarray,
    weights: LossWeights,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full consistency loss from predicted depths
    (reference: loss/consistency_loss.py:210-253).

    Args:
        depths: (B, 2, H, W) predicted depth for both frames of each pair
        valid:  optional (B,) in {0, 1}; padded samples contribute 0 and
                the scalar mean divides by the valid count.
    """
    H, W = depths.shape[-2:]
    pixels = geometry.pixel_grid((H, W), dtype=depths.dtype)
    points_cam = geometry.pixels_to_points(intrinsics, depths, pixels)

    scalar, batch_losses = geometry_consistency_loss(
        points_cam, intrinsics, extrinsics, pixels, flows, masks, weights
    )
    if valid is not None:
        v = valid.astype(depths.dtype)
        batch_losses = {k: x * v for k, x in batch_losses.items()}
        total = sum(batch_losses.values())
        scalar = jnp.sum(total) / jnp.clip(jnp.sum(v), min=1.0)
    return scalar, batch_losses


def parameter_loss(
    params, params_init, lambda_parameter: float
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """L1 pull toward the pretrained weights
    (reference: loss/parameter_loss.py)."""
    diffs = jax.tree_util.tree_map(
        lambda p, pi: jnp.sum(jnp.abs(p - pi)), params, params_init
    )
    total = lambda_parameter * jax.tree_util.tree_reduce(
        jnp.add, diffs, jnp.asarray(0.0, jnp.float32)
    )
    return total, {"parameter_loss": total.reshape(1, 1)}


def joint_loss(
    depths: jnp.ndarray,
    intrinsics: jnp.ndarray,
    extrinsics: jnp.ndarray,
    flows: jnp.ndarray,
    masks: jnp.ndarray,
    weights: LossWeights,
    params=None,
    params_init=None,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Sum of parameter and consistency losses
    (reference: loss/joint_loss.py)."""
    loss = jnp.asarray(0.0, depths.dtype)
    batch_losses: Dict[str, jnp.ndarray] = {}
    if weights.lambda_parameter > 0:
        assert params is not None and params_init is not None
        p_loss, p_batch = parameter_loss(
            params, params_init, weights.lambda_parameter)
        loss = loss + p_loss
        batch_losses.update(p_batch)
    if weights.lambda_view_baseline > 0 or weights.lambda_reprojection > 0:
        c_loss, c_batch = consistency_loss(
            depths, intrinsics, extrinsics, flows, masks, weights, valid=valid
        )
        loss = loss + c_loss
        batch_losses.update(c_batch)
    return loss, batch_losses
