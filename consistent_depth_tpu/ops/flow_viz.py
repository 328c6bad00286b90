"""Optical-flow color-wheel visualization.

First-party replacement for the reference's OpticalFlowToolkit
dependency (flowlib.flow_to_image — used at flow.py:175). Standard
Middlebury color wheel."""

from __future__ import annotations

import numpy as np

_UNKNOWN_FLOW_THRESH = 1e7


def make_color_wheel() -> np.ndarray:
    """(55, 3) RGB color wheel."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col:col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col:col + YG, 1] = 255
    col += YG
    wheel[col:col + GC, 1] = 255
    wheel[col:col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col:col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col:col + CB, 2] = 255
    col += CB
    wheel[col:col + BM, 2] = 255
    wheel[col:col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col:col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col:col + MR, 0] = 255
    return wheel


_WHEEL = None


def compute_color(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Map normalized flow components to RGB (uint8 HxWx3)."""
    global _WHEEL
    if _WHEEL is None:
        _WHEEL = make_color_wheel()
    wheel = _WHEEL
    ncols = wheel.shape[0]

    nan_idx = np.isnan(u) | np.isnan(v)
    u = np.where(nan_idx, 0, u)
    v = np.where(nan_idx, 0, v)

    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0

    img = np.zeros(u.shape + (3,), np.uint8)
    for i in range(3):
        col0 = wheel[k0, i] / 255.0
        col1 = wheel[k1, i] / 255.0
        col = (1 - f) * col0 + f * col1
        inner = rad <= 1
        col = np.where(inner, 1 - rad * (1 - col), col * 0.75)
        img[..., i] = np.uint8(np.floor(255 * col * (1 - nan_idx)))
    return img


def flow_to_image_jnp(flows):
    """Batched device twin of :func:`flow_to_image`:
    (B, H, W, 2) float32 -> (B, H, W, 3) uint8-valued float32 RGB.

    Same Middlebury wheel and per-image max-radius normalization; wheel
    lookups are single-element gathers per channel (slice gathers are
    unsafe on this TPU runtime — see ops/resample.py NOTE). Built for
    the flow-stage visualizer, which renders thousands of pairs in a
    few device batches instead of a per-image float64 numpy loop."""
    import jax.numpy as jnp

    wheel = jnp.asarray(make_color_wheel(), jnp.float32)   # (55, 3)
    ncols = wheel.shape[0]

    u = flows[..., 0].astype(jnp.float32)
    v = flows[..., 1].astype(jnp.float32)
    unknown = (jnp.abs(u) > _UNKNOWN_FLOW_THRESH) | (
        jnp.abs(v) > _UNKNOWN_FLOW_THRESH)
    u = jnp.where(unknown, 0.0, u)
    v = jnp.where(unknown, 0.0, v)

    rad = jnp.sqrt(u * u + v * v)
    maxrad = jnp.maximum(
        -1.0, jnp.max(rad, axis=(1, 2), keepdims=True))    # per image
    eps = float(np.finfo(np.float64).eps)
    un = u / (maxrad + eps)
    vn = v / (maxrad + eps)

    nan_idx = jnp.isnan(un) | jnp.isnan(vn)
    un = jnp.where(nan_idx, 0.0, un)
    vn = jnp.where(nan_idx, 0.0, vn)
    radn = jnp.sqrt(un * un + vn * vn)
    a = jnp.arctan2(-vn, -un) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = jnp.floor(fk).astype(jnp.int32)
    k1 = (k0 + 1) % ncols
    f = fk - k0

    chans = []
    for i in range(3):
        wc = wheel[:, i] / 255.0                           # (55,)
        col0 = jnp.take(wc, k0.reshape(-1)).reshape(k0.shape)
        col1 = jnp.take(wc, k1.reshape(-1)).reshape(k1.shape)
        col = (1 - f) * col0 + f * col1
        col = jnp.where(radn <= 1, 1 - radn * (1 - col), col * 0.75)
        chans.append(jnp.floor(255 * col * (1 - nan_idx)))
    img = jnp.stack(chans, axis=-1)
    return jnp.where(unknown[..., None], 0.0, img)


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) uint8 RGB visualization."""
    u = flow[..., 0].astype(np.float64).copy()
    v = flow[..., 1].astype(np.float64).copy()

    unknown = (np.abs(u) > _UNKNOWN_FLOW_THRESH) | (
        np.abs(v) > _UNKNOWN_FLOW_THRESH)
    u[unknown] = 0
    v[unknown] = 0

    rad = np.sqrt(u ** 2 + v ** 2)
    maxrad = max(-1.0, float(np.max(rad)) if rad.size else -1.0)
    eps = np.finfo(float).eps
    u = u / (maxrad + eps)
    v = v / (maxrad + eps)

    img = compute_color(u, v)
    img[unknown] = 0
    return img
