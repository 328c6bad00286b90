"""Fused space-to-depth convolution as a Pallas TPU kernel.

The production conv path for MXU-hostile shapes (C_out in {16, 32}) is
the space-to-depth reformulation (models/layers.py): XLA executes it as
three HBM-materialized stages — transpose x into the expanded layout,
conv, transpose back. The round-4 attribution left ~17.6 ms/step of
layout/transpose/fusion slack tied to that path (PERF.md); this kernel
attacks it by doing the s2d gather and the inverse depth-to-space in
VMEM staging around the tap matmuls, so the expanded layout never
exists in HBM:

  per grid program (co-block, image, row-band):
    DMA the x row-band (original NHWC layout, vertical halo) into VMEM
    -> s2d relayout in VMEM (one reshape/transpose over the band)
    -> kk x kk tap matmuls against the s2d kernel block, f32 accum
    -> depth-to-space the accumulator in VMEM
    -> write the NHWC output band

The contraction shapes are identical to the XLA s2d conv (depth s^2*Ci,
lanes min(s^2*Co, co_block)); only the layout passes are eliminated.

Weights arrive PRE-TRANSFORMED (s2d_kernel applied outside, where it is
differentiable); x arrives pre-padded so every tap read is in range.

Reference context: the convs this feeds are the MannequinChallenge
hourglass inception branches (reference submodule models/hourglass.py,
adapter /root/reference/monodepth/mannequin_challenge_model.py) — the
hot fwd/bwd of the fine-tune loop (depth_fine_tuning.py:261-304).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _s2d_conv_kernel(w2_ref, xp_hbm_ref, out_ref, *, s, kk,
                     block_h, w_out, ci):
    """One (co_block, image, row-band) program.

    Args (refs):
        w2_ref: (kk, kk, s^2*Ci, CO_BLK) s2d kernel block in VMEM,
            where CO_BLK = s^2 * co_per (the caller's per-split slice
            of the expanded output channels)
        xp_hbm_ref: (N, Hp, Wp, Ci) input, pre-padded by the caller so
            every tap read is in range; stays in HBM — the kernel DMAs
            one (block_h + kk - 1) * s row band into VMEM per program
        out_ref: (1, block_h * s, w_out, co_per) output tile in
            ORIGINAL (depth-to-space'd) layout — the kernel contracts
            in s2d space and writes the d2s'd rows back, so the
            expanded layout never exists outside VMEM
    """
    n = pl.program_id(1)
    i = pl.program_id(2)
    rows_band = (block_h + kk - 1) * s
    wp = xp_hbm_ref.shape[2]
    wp_s = wp // s
    co_blk = w2_ref.shape[-1]
    co_orig = co_blk // (s * s)

    def body(band_vmem, sem):
        dma = pltpu.make_async_copy(
            xp_hbm_ref.at[n, pl.ds(i * block_h * s, rows_band)],
            band_vmem, sem)
        dma.start()
        w2 = w2_ref[...]
        dma.wait()
        band = band_vmem[...]                  # (rows_band, Wp, Ci)
        # s2d relayout in VMEM: (R*s, Wp, Ci) -> (R, Wp/s, s*s*Ci)
        x2 = band.reshape(block_h + kk - 1, s, wp_s, s, ci)
        x2 = x2.transpose(0, 2, 1, 3, 4)
        x2 = x2.reshape(block_h + kk - 1, wp_s, s * s * ci)

        w_s = wp_s - kk + 1                    # = W/s
        acc = jnp.zeros((block_h * w_s, co_blk), jnp.float32)
        for r in range(kk):
            for c in range(kk):
                operand = x2[r:r + block_h, c:c + w_s, :].reshape(
                    block_h * w_s, s * s * ci)
                acc = acc + jax.lax.dot_general(
                    operand, w2[r, c],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        # depth-to-space the accumulator: (bh, W/s, s, s, Co) ->
        # (bh*s, W, Co)
        y = acc.reshape(block_h, w_out // s, s, s, co_orig)
        y = y.transpose(0, 2, 1, 3, 4)
        y = y.reshape(block_h * s, w_out, co_orig)
        out_ref[0] = y.astype(out_ref.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((rows_band, wp, ci), xp_hbm_ref.dtype),
        pltpu.SemaphoreType.DMA(()),
    )


def s2d_conv_pallas(x, w, s, k=None, block_h=8, co_split=1,
                    interpret=None):
    """See :func:`_s2d_conv_pallas_jit`. ``interpret=None`` resolves to
    True on CPU (tests exercise the identical kernel body there)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _s2d_conv_pallas_jit(
        x, w, s=s, k=k, block_h=block_h, co_split=co_split,
        interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("s", "k", "block_h", "co_split", "interpret"))
def _s2d_conv_pallas_jit(
    x: jnp.ndarray,
    w: jnp.ndarray,
    s: int,
    k: int | None = None,
    block_h: int = 8,
    co_split: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused s2d conv: x (N, H, W, Ci), w (k, k, Ci, Co) -> (N, H, W, Co)
    for the s2d-eligible class (stride 1, dilation 1, odd k, symmetric
    same padding). Numerically the same contraction as the XLA s2d
    path (f32 tap accumulation), without the HBM layout round trips.

    Args:
        co_split: split factor over the s2d output-channel axis (keeps
            the weight block inside VMEM for big kernels, e.g. A.11's
            12.8 MB w2); must divide s^2*Co.
    """
    from ..models.layers import s2d_kernel

    N, H, W, Ci = x.shape
    k = k or w.shape[0]
    Co = w.shape[-1]
    assert H % (s * block_h) == 0, (H, s, block_h)
    assert W % s == 0, (W, s)

    w2, kk, pad = s2d_kernel(w, s)            # (kk, kk, s2Ci, s2Co)
    s2co = s * s * Co
    assert s2co % co_split == 0
    co_blk = s2co // co_split
    # output channels of one co block, in ORIGINAL channel space: the
    # s2d channel order is (phase_y, phase_x, c), so an even split over
    # s2Co only maps back to whole original channels when co_blk is a
    # multiple of ... it is NOT contiguous in original channels unless
    # co_split == 1. Split instead over the ORIGINAL Co axis by
    # reshaping w2's last dim (s, s, Co) and slicing Co:
    assert Co % co_split == 0
    co_per = Co // co_split
    w2r = w2.reshape(kk, kk, s * s * Ci, s, s, Co)

    # pre-pad x so every tap read is in range (vertical handled by the
    # band DMA offsets; horizontal by the same padding)
    top = pad * s
    bot = (kk - 1 - pad) * s
    xp = jnp.pad(x, ((0, 0), (top, bot), (top, bot), (0, 0)))
    wp = xp.shape[2]

    outs = []
    for cb in range(co_split):
        w2_blk = w2r[..., cb * co_per:(cb + 1) * co_per].reshape(
            kk, kk, s * s * Ci, s * s * co_per)
        out = pl.pallas_call(
            functools.partial(
                _s2d_conv_kernel, s=s, kk=kk,
                block_h=block_h, w_out=W, ci=Ci),
            grid=(1, N, H // (s * block_h)),
            in_specs=[
                pl.BlockSpec(
                    (kk, kk, s * s * Ci, s * s * co_per),
                    lambda co, n, i: (0, 0, 0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),  # xp stays in HBM
            ],
            out_specs=pl.BlockSpec(
                (1, block_h * s, W, co_per),
                lambda co, n, i: (n, i, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, H, W, co_per), x.dtype),
            interpret=interpret,
        )(w2_blk, xp)
        outs.append(out)
    return outs[0] if co_split == 1 else jnp.concatenate(outs, axis=-1)
