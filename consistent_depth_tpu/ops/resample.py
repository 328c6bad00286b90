"""Bilinear resampling with exact torch ``grid_sample`` parity.

This is the TPU replacement for the reference's cuDNN ``grid_sample``
(used in the loss chain, consistency masks, and image warps — reference:
utils/geometry.py:201-208, utils/consistency.py:8-23). Semantics matched:
torch 1.4 defaults, i.e. ``align_corners=False`` with
``padding_mode='border'``:

    x_src = ((g + 1) * W - 1) / 2        for normalized grid g
    x_src clipped to [0, W-1], then bilinear with corner clamping.

NaN/Inf sampling coordinates propagate NaN into the output (matching
torch), which downstream masking/NaN-skip handles.

Implementation: flat gather over H*W, which XLA lowers to an efficient
dynamic-gather on TPU. (Measured in round 1: the loss chain is a few ms
per step next to the backbone's hundreds, so no fused kernel is needed
here.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_hw(data: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """data (H, W, C), integer ix/iy (...,) -> (..., C)."""
    H, W, _ = data.shape
    flat = data.reshape(H * W, -1)
    idx = iy * W + ix
    return jnp.take(flat, idx, axis=0)


def bilinear_sample_pixels(
    data: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Sample ``data`` (H, W, C) at continuous source-pixel coords
    ``x``/``y`` (...,), border padding. Returns (..., C).

    Matches torch ``grid_sample`` after its unnormalize step: caller is
    responsible for converting normalized grid coords to source pixels.
    """
    H, W, _ = data.shape
    # border padding: clip source coordinates first (torch clip_coordinates)
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f

    # indices must be finite for the gather; NaN weights still poison the
    # result, preserving torch's NaN propagation
    x0 = jnp.clip(jnp.nan_to_num(x0f), 0, W - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.nan_to_num(y0f), 0, H - 1).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)

    v00 = _gather_hw(data, x0, y0)
    v01 = _gather_hw(data, x1, y0)
    v10 = _gather_hw(data, x0, y1)
    v11 = _gather_hw(data, x1, y1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def grid_sample(data: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch-parity ``F.grid_sample(data, grid, padding_mode='border',
    align_corners=False)`` with NHWC layout.

    Args:
        data: (B, H, W, C)
        grid: (B, Ho, Wo, 2) normalized coords in [-1, 1] (x, y order)

    Returns:
        (B, Ho, Wo, C)
    """
    H, W = data.shape[1:3]
    x = ((grid[..., 0] + 1.0) * W - 1.0) * 0.5
    y = ((grid[..., 1] + 1.0) * H - 1.0) * 0.5
    return jax.vmap(bilinear_sample_pixels)(data, x, y)


def sample_uv(data: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Reference ``geometry.sample``: uv in pixels, normalized by
    (W-1, H-1) before grid_sample (reference: utils/geometry.py:201-208).

    Net effect under align_corners=False: x_src = u * W/(W-1) - 0.5.

    Args:
        data: (B, H, W, C)
        uv:   (B, Ho, Wo, 2) pixel coordinates

    Returns:
        (B, Ho, Wo, C)
    """
    H, W = data.shape[1:3]
    size = jnp.array([W - 1.0, H - 1.0], dtype=uv.dtype)
    grid = 2.0 * uv / size - 1.0
    return grid_sample(data, grid)


def sample_uv_wh(data: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Reference ``consistency.sample``: uv in pixels normalized by
    (W, H) (reference: utils/consistency.py:8-23). Net effect:
    x_src = u - 0.5."""
    H, W = data.shape[1:3]
    size = jnp.array([float(W), float(H)], dtype=uv.dtype)
    grid = 2.0 * uv / size - 1.0
    return grid_sample(data, grid)
