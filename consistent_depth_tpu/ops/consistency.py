"""Flow-consistency masks (reference: utils/consistency.py).

mask = in-image(p + flow)
     ∧ ‖flow_fwd + flow_bwd∘flow_fwd‖² < flow_thresh²
     ∧ photometric SSE < C·color_thresh²

TPU-first: batched over all frame pairs at once (the reference loops
pairs on host, one grid_sample each — flow.py:199-228); one jit call
masks the whole video.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import geometry
from .resample import sample_uv_wh


def consistency_mask(
    im_ref: jnp.ndarray,
    im_tgt: jnp.ndarray,
    flow: jnp.ndarray,
    threshold: float,
) -> jnp.ndarray:
    """Batched mask (reference: utils/consistency.py:32-50).

    Args:
        im_ref/im_tgt: (B, H, W, C)
        flow: (B, H, W, 2) pixels
        threshold: scalar on the per-pixel SSE

    Returns:
        (B, H, W) bool
    """
    H, W = im_ref.shape[1:3]
    pixels = geometry.pixel_grid((H, W), dtype=flow.dtype)
    idx = pixels + flow
    in_image = (
        (idx[..., 0] >= 0) & (idx[..., 0] <= W - 1)
        & (idx[..., 1] >= 0) & (idx[..., 1] <= H - 1)
    )
    warped = sample_uv_wh(im_tgt, idx)
    sse = jnp.sum((im_ref - warped) ** 2, axis=-1)
    return in_image & (sse < threshold)


@jax.jit
def consistent_flow_masks(
    flows: jnp.ndarray,
    colors: jnp.ndarray,
    flow_thresh: float = 1.0,
    color_thresh: float = 1.0,
) -> jnp.ndarray:
    """Both-direction masks for a batch of pairs
    (reference: utils/consistency.py:53-67).

    Args:
        flows:  (P, 2, H, W, 2) — [k] is flow frame_k -> frame_{1-k}
        colors: (P, 2, H, W, C)

    Returns:
        (P, 2, H, W) bool masks
    """
    C = colors.shape[-1]
    masks = []
    for k in (0, 1):
        j = 1 - k
        m_flow = consistency_mask(
            flows[:, k], -flows[:, j], flows[:, k], flow_thresh ** 2)
        m_photo = consistency_mask(
            colors[:, k], colors[:, j], flows[:, k], C * color_thresh ** 2)
        masks.append(m_flow & m_photo)
    return jnp.stack(masks, axis=1)
