"""Correlation / cost-volume op — the core primitive of FlowNet-style
flow networks (the reference's ``correlation_package`` CUDA op,
SURVEY §2.2). TPU-native:

- :func:`correlation`: pure-jnp reference (padded shifts + channel
  contraction; XLA fuses the D^2 shift-multiply-reduce chain).
- :func:`correlation_pallas`: Pallas kernel tiling the image into VMEM
  row-bands with displacement halos (manual HBM->VMEM DMA, since
  overlapping blocks can't be expressed as BlockSpecs); each f2
  neighborhood is resident once per band instead of refetched per
  displacement.

Layout: NHWC in, (B, H, W, D*D) out with D = 2*(max_displacement//stride)+1,
displacement planes dy-major, values averaged over channels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def correlation(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    max_displacement: int = 20,
    stride: int = 2,
) -> jnp.ndarray:
    """Pure-jnp cost volume.

    Args:
        f1, f2: (B, H, W, C)
    Returns:
        (B, H, W, D*D)
    """
    B, H, W, C = f1.shape
    r = max_displacement // stride
    d = max_displacement
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    planes = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            oy, ox = d + dy * stride, d + dx * stride
            shifted = jax.lax.dynamic_slice(
                f2p, (0, oy, ox, 0), (B, H, W, C))
            planes.append(jnp.mean(f1 * shifted, axis=-1))
    return jnp.stack(planes, axis=-1)


def _corr_kernel(f1_ref, f2_hbm_ref, out_ref, *, r, stride, block_h):
    """One (block_h, W) row-band of one batch element per program. The
    f1 band is staged by the BlockSpec pipeline; the overlapping f2 band
    (vertical halo of max_displacement rows each side) is DMA'd from HBM
    explicitly (overlapping blocks can't be expressed as BlockSpecs)."""
    d = r * stride
    b = pl.program_id(0)
    i = pl.program_id(1)

    def body(f2_vmem, sem):
        dma = pltpu.make_async_copy(
            f2_hbm_ref.at[b, pl.ds(i * block_h, block_h + 2 * d)],
            f2_vmem, sem)
        dma.start()
        f1 = f1_ref[0]                  # (bh, W, C)
        dma.wait()
        C = f1.shape[-1]
        inv_c = 1.0 / C
        bh, W = f1.shape[0], f1.shape[1]
        # displacements are static -> plain ref slices (dynamic_slice is
        # not lowerable in Pallas TPU)
        for iy, dy in enumerate(range(-r, r + 1)):
            oy = d + dy * stride
            for ix, dx in enumerate(range(-r, r + 1)):
                ox = d + dx * stride
                win = f2_vmem[oy:oy + bh, ox:ox + W, :]
                out_ref[0, :, :, iy * (2 * r + 1) + ix] = (
                    jnp.sum(f1 * win, axis=-1) * inv_c)

    pl.run_scoped(
        body,
        pltpu.VMEM(
            (block_h + 2 * d,
             f2_hbm_ref.shape[-2], f2_hbm_ref.shape[-1]),
            f1_ref.dtype),
        pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(
    jax.jit, static_argnames=("max_displacement", "stride", "block_h",
                              "interpret"))
def correlation_pallas(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    max_displacement: int = 20,
    stride: int = 2,
    block_h: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas cost volume (same contract as :func:`correlation`).

    The batch rides the grid's leading axis (vmapping a pallas_call with
    an ANY-space operand is not lowerable on TPU)."""
    B, H, W, C = f1.shape
    r = max_displacement // stride
    d = max_displacement
    D = 2 * r + 1
    assert H % block_h == 0, (H, block_h)

    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))

    return pl.pallas_call(
        functools.partial(
            _corr_kernel, r=r, stride=stride, block_h=block_h),
        grid=(B, H // block_h),
        in_specs=[
            pl.BlockSpec(
                (1, block_h, W, C), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, block_h, W, D * D), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, D * D), f1.dtype),
        interpret=interpret,
    )(f1, f2p)


def correlation_auto(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    max_displacement: int = 20,
    stride: int = 2,
) -> jnp.ndarray:
    """Backend dispatch: the Pallas kernel on TPU (when the height tiles
    into row-bands), the jnp formulation elsewhere (CPU tests, odd
    shapes)."""
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu and f1.shape[1] % 8 == 0 and f1.dtype == jnp.float32:
        return correlation_pallas(
            f1, f2, max_displacement=max_displacement, stride=stride,
            block_h=8)
    return correlation(f1, f2, max_displacement, stride)
