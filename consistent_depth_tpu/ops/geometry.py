"""Differentiable camera geometry — the numeric core, in jnp.

Conventions (identical to the reference, utils/geometry.py):

- pixels (x, y) in [0, W-1] x [0, H-1], top-left origin
- intrinsics rows are (fx, fy, cx, cy)
- camera looks along -z, y up: ray = ((u-cx)/fx, -(v-cy)/fy, -1)
- extrinsics (3, 4) = [R | t] is world-from-camera: x_world = R p + t

Layout is channels-last ((..., H, W, 3) points etc.) — TPU-friendly and
vmap-compatible. Gradients flow through depths only; poses are fixed.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from .resample import sample_uv


def pixel_grid(shape, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) grid of (x, y) pixel positions."""
    H, W = shape
    x = jnp.arange(W, dtype=dtype)
    y = jnp.arange(H, dtype=dtype)
    X, Y = jnp.meshgrid(x, y)
    return jnp.stack((X, Y), axis=-1)


def focal_length(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (..., 2) = (fx, fy)."""
    return intrinsics[..., :2]


def principal_point(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (..., 2) = (cx, cy)."""
    return intrinsics[..., 2:]


def pixels_to_rays(pixels: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., H, W, 2) + intrinsics (..., 4) -> rays (..., H, W, 3)
    with z = -1 (reference: utils/geometry.py:38-61)."""
    cs = principal_point(intrinsics)[..., None, None, :]
    fs = focal_length(intrinsics)[..., None, None, :]
    uv = pixels - cs
    uv = uv * jnp.array([1.0, -1.0], dtype=pixels.dtype)  # flip v
    uv = uv / fs
    ones = -jnp.ones(uv.shape[:-1] + (1,), dtype=uv.dtype)
    return jnp.concatenate((uv, ones), axis=-1)


def project(points: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Camera-space points (..., H, W, 3) -> pixel coords (..., H, W, 2)
    (reference: utils/geometry.py:64-83)."""
    rays = points / -points[..., -1:]
    fs = focal_length(intrinsics)[..., None, None, :]
    cs = principal_point(intrinsics)[..., None, None, :]
    uv = rays[..., :2] * fs
    uv = uv * jnp.array([1.0, -1.0], dtype=points.dtype)  # (u, -v)
    return uv + cs


def pixels_to_points(
    intrinsics: jnp.ndarray, depths: jnp.ndarray, pixels: jnp.ndarray
) -> jnp.ndarray:
    """Back-project: depths (..., H, W), pixels (..., H, W, 2) ->
    camera-space points (..., H, W, 3) (reference: utils/geometry.py:86-100)."""
    rays = pixels_to_rays(pixels, intrinsics)
    return rays * depths[..., None]


def reproject_points(
    points_cam_ref: jnp.ndarray,
    extrinsics_ref: jnp.ndarray,
    extrinsics_tgt: jnp.ndarray,
) -> jnp.ndarray:
    """Map points from the reference camera frame to the target camera
    frame via world space (reference: utils/geometry.py:103-128).

    Args:
        points_cam_ref: (..., H, W, 3)
        extrinsics_ref/tgt: (..., 3, 4) world-from-camera [R | t]
    """
    R_ref = extrinsics_ref[..., :, :3]
    t_ref = extrinsics_ref[..., :, 3]
    R_tgt = extrinsics_tgt[..., :, :3]
    t_tgt = extrinsics_tgt[..., :, 3]

    # x_world = R_ref p + t_ref. The 3x3 pose matmuls are tiny; run them
    # at full f32 precision so TPU bf16 MXU passthrough can't skew poses.
    points_world = (
        jnp.einsum("...ij,...hwj->...hwi", R_ref, points_cam_ref,
                   precision="highest")
        + t_ref[..., None, None, :]
    )
    # p_tgt = R_tgt^T (x_world - t_tgt)
    return jnp.einsum(
        "...ji,...hwj->...hwi", R_tgt, points_world - t_tgt[..., None, None, :],
        precision="highest",
    )


def depth_to_points(depths: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """depths (..., H, W), intrinsics (..., 4) -> points (..., H, W, 3)."""
    H, W = depths.shape[-2:]
    pixels = pixel_grid((H, W), dtype=depths.dtype)
    return pixels_to_points(intrinsics, depths, pixels)


def calibrate_scale(
    extrinsics: jnp.ndarray, intrinsics: jnp.ndarray, depths: jnp.ndarray
) -> jnp.ndarray:
    """Scene-center based global scale between a depth pair and its
    camera translation (reference: utils/geometry.py:143-174; auxiliary,
    not on the main pipeline path).

    Args:
        extrinsics (2, 3, 4), intrinsics (2, 4), depths (2, H, W)
    """
    points_cam = depth_to_points(depths, intrinsics)
    Rs = extrinsics[..., :, :3]
    ts = extrinsics[..., :, 3]
    points_rot = jnp.einsum("bij,bhwj->bhwi", Rs, points_cam,
                            precision="highest")
    mus = jnp.mean(points_rot.reshape(points_rot.shape[0], -1, 3), axis=1)
    dmu = mus[0] - mus[1]
    dt = ts[0] - ts[1]
    return -jnp.dot(dt, dmu) / jnp.dot(dt, dt)


def warping_field(
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    depths: jnp.ndarray,
    tgt_ids: Sequence[int],
) -> jnp.ndarray:
    """Sampling field: uv[i] samples frame tgt_ids[i] to produce frame i
    (reference: utils/geometry.py:177-198).

    Args:
        extrinsics (N, 3, 4), intrinsics (N, 4), depths (N, H, W)
    """
    tgt_ids = jnp.asarray(tgt_ids)
    points_cam = depth_to_points(depths, intrinsics)
    points_tgt = reproject_points(points_cam, extrinsics, extrinsics[tgt_ids])
    return project(points_tgt, intrinsics[tgt_ids])


def warp_image(
    images: jnp.ndarray,
    depths: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsics: jnp.ndarray,
    tgt_ids: Sequence[int],
) -> jnp.ndarray:
    """Warp images[tgt_ids[i]] into frame i's view using depths[i]
    (reference: utils/geometry.py:211-227).

    Args:
        images (N, H, W, C), depths (N, H, W)
    """
    tgt_ids = jnp.asarray(tgt_ids)
    uv_tgt = warping_field(extrinsics, intrinsics, depths, tgt_ids)
    return sample_uv(images[tgt_ids], uv_tgt)
