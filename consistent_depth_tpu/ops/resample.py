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


def bilinear_sample_pixels_reference(
    data: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Plain 4-corner-gather formulation (the numeric reference for the
    fast path below; identical semantics)."""
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


# ---------------------------------------------------------------------------
# Fast path: packed single-gather forward + 4-scatter backward.
#
# Measured on v5e (tools/gather_bench.py): XLA lowers TPU gathers at a
# per-INDEX rate, so fetching all four bilinear corners with one index
# (the operand holds [self, +1, +W, +W+1] rolled copies as channels) is
# ~4.4x faster than four corner gathers (21.9 -> 4.9 ms for the loss's
# sampling workload). The same trick applied to the backward is SLOWER
# (packed scatter 28 ms vs four plain scatter-adds 18 ms), hence the
# custom VJP pairing the packed forward with the plain scatter backward.
# NOTE: lax.gather/scatter with slice windows (slice_sizes > 1 in the
# major dim) crashes this TPU runtime — only element gathers are used.
# ---------------------------------------------------------------------------

def _corner_coords(data_hw, x, y):
    """Clamped base corner + weights. Uses the x0 <= W-2 convention:
    at the right/bottom border the base moves inside and the weight
    saturates to 1, which reproduces border clamping exactly."""
    H, W = data_hw
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.clip(jnp.nan_to_num(jnp.floor(x)), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.nan_to_num(jnp.floor(y)), 0, H - 2).astype(jnp.int32)
    return x0, y0, x - x0, y - y0


@jax.custom_vjp
def _bilinear_fast(data: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    out, _ = _bilinear_fast_fwd(data, x, y)
    return out


def _bilinear_fast_fwd(data, x, y):
    H, W, C = data.shape
    x0, y0, wx, wy = _corner_coords((H, W), x, y)
    flat = data.reshape(H * W, C)

    def roll_up(a, k):
        return jnp.concatenate([a[k:], a[:k]], axis=0)

    packed = jnp.concatenate(
        [flat, roll_up(flat, 1), roll_up(flat, W), roll_up(flat, W + 1)],
        axis=-1)                                    # (HW, 4C)
    idx = y0 * W + x0
    win = jnp.take(packed, idx.reshape(-1), axis=0).reshape(
        x.shape + (4, C))
    wxc = wx[..., None]
    wyc = wy[..., None]
    top = win[..., 0, :] * (1 - wxc) + win[..., 1, :] * wxc
    bot = win[..., 2, :] * (1 - wxc) + win[..., 3, :] * wxc
    out = top * (1 - wyc) + bot * wyc
    return out, (win, idx, wx, wy, x, y, data.shape)


# The scatter-add backward runs at TPU's per-element scatter rate
# (~7-10 ns each => ~19 ms/step for the loss workload). The bilinear
# splat weight is SEPARABLE (w = y-part * x-part), so the whole
# scatter-add factorizes into a dense one-hot matmul per plane:
#     d[y, x] = sum_p A[p, k, y] * B[p, x]   (+ a one-column shift)
# with A the ct*y-part two-hot (x-parts folded as k=2 channels) and B
# the EXACT 0/1 one-hot of x0 — contraction over all P sample points
# rides the MXU at full depth. ~30 GFLOP/plane beats 344k scatters by
# ~4x measured. One-hot 0/1 entries are exact in bf16; the weighted
# factor is bf16-rounded (~0.4% per contribution), consistent with the
# bf16 model gradients — so the path is gated to bf16 production mode
# (engine sets it) and f32/parity runs keep the exact scatter.

_SPLAT_MATMUL = False


def set_splat_enabled(flag: bool) -> None:
    """Toggle the matmul-splat backward (engine enables it under bf16).

    Like the compute-dtype policy this is captured at TRACE time:
    programs jitted while the flag was set keep their choice; set it
    (via TrainingEngine's precision, normally) before building the
    functions whose gradients it should affect."""
    global _SPLAT_MATMUL
    _SPLAT_MATMUL = bool(flag)


def _splat_bwd_matmul(ct, idx, wx, wy, H: int, W: int):
    """d_data (H, W, 1) from cotangent ct (..., 1) via the separable
    one-hot matmul splat. Requires the _corner_coords convention
    (y0 <= H-2, x0 <= W-2), so every corner lands in range."""
    P = idx.size
    f = ct.dtype
    ctf = ct.reshape(P)
    idxf = idx.reshape(P)
    y0 = idxf // W
    x0 = idxf - y0 * W
    wyf = wy.reshape(P).astype(f)
    wxf = wx.reshape(P).astype(f)
    a0 = ctf * (1 - wyf)          # value at row y0
    a1 = ctf * wyf                # value at row y0 + 1

    iy = jax.lax.broadcasted_iota(jnp.int32, (P, H), 1)

    def two_hot(v0, v1):
        return (jnp.where(iy == y0[:, None], v0[:, None], jnp.zeros((), f))
                + jnp.where(iy == y0[:, None] + 1, v1[:, None],
                            jnp.zeros((), f)))

    # k channels carry the x-interpolation parts: k=0 -> (1-wx) at
    # column x0, k=1 -> wx at column x0+1 (applied as a shift below)
    A = jnp.stack(
        [two_hot(a0 * (1 - wxf), a1 * (1 - wxf)),
         two_hot(a0 * wxf, a1 * wxf)], axis=1).astype(jnp.bfloat16)
    ix = jax.lax.broadcasted_iota(jnp.int32, (P, W), 1)
    Bx = (ix == x0[:, None]).astype(jnp.bfloat16)     # exact 0/1
    out = jnp.einsum("pky,px->kyx", A, Bx,
                     preferred_element_type=jnp.float32)
    d = out[0] + jnp.concatenate(
        [jnp.zeros((H, 1), out.dtype), out[1, :, :-1]], axis=1)
    return d.astype(ct.dtype).reshape(H, W, 1)


def _bilinear_fast_bwd(res, ct):
    win, idx, wx, wy, x, y, shape = res
    H, W, C = shape
    wxc = wx[..., None]
    wyc = wy[..., None]

    if _SPLAT_MATMUL and C == 1:
        d_data = _splat_bwd_matmul(ct, idx, wx, wy, H, W)
    else:
        w00 = (1 - wxc) * (1 - wyc)
        w01 = wxc * (1 - wyc)
        w10 = (1 - wxc) * wyc
        w11 = wxc * wyc

        flat_ct = jnp.zeros((H * W, C), ct.dtype)
        idxf = idx.reshape(-1)
        for off, w in ((0, w00), (1, w01), (W, w10), (W + 1, w11)):
            flat_ct = flat_ct.at[idxf + off].add(
                (ct * w).reshape(-1, C), mode="drop")
        d_data = flat_ct.reshape(H, W, C)

    # position gradients from the fetched corner values. The border
    # clip contributes zero gradient outside [0, size-1], AND at
    # exactly size-1: there the reference formulation has x0 = x1 =
    # size-1 (identical corners -> d/dx = 0) while this path's
    # x0 <= size-2 convention keeps distinct corners, so the bound
    # must be strict or border-exact samples (e.g. identity warps)
    # would leak a one-sided finite difference the reference autodiff
    # does not produce.
    H_, W_ = shape[0], shape[1]
    in_x = ((x >= 0) & (x < W_ - 1)).astype(ct.dtype)
    in_y = ((y >= 0) & (y < H_ - 1)).astype(ct.dtype)
    top_dx = win[..., 1, :] - win[..., 0, :]
    bot_dx = win[..., 3, :] - win[..., 2, :]
    d_x = jnp.sum(ct * (top_dx * (1 - wyc) + bot_dx * wyc), axis=-1) * in_x
    top = win[..., 0, :] * (1 - wxc) + win[..., 1, :] * wxc
    bot = win[..., 2, :] * (1 - wxc) + win[..., 3, :] * wxc
    d_y = jnp.sum(ct * (bot - top), axis=-1) * in_y
    return d_data, d_x, d_y


_bilinear_fast.defvjp(_bilinear_fast_fwd, _bilinear_fast_bwd)


def bilinear_sample_pixels(
    data: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Sample ``data`` (H, W, C) at continuous source-pixel coords
    ``x``/``y`` (...,), border padding. Returns (..., C).

    Matches torch ``grid_sample`` after its unnormalize step: caller is
    responsible for converting normalized grid coords to source pixels.
    """
    H, W, _ = data.shape
    if H < 2 or W < 2:
        return bilinear_sample_pixels_reference(data, x, y)
    return _bilinear_fast(data, x, y)


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
