"""MannequinChallenge "Ours_Bilinear" hourglass depth network in Flax.

The default backbone of the pipeline (reference adapter:
monodepth/mannequin_challenge_model.py; architecture from the
mannequin_challenge submodule's models/hourglass.py — the nested
inception hourglass of Chen et al. "Single-Image Depth Perception in
the Wild", as used by Li et al. "Learning the Depths of Moving People
by Watching Frozen People", CVPR 2019).

Structure (NHWC here; channel counts identical to the torch original):

    seq = Conv7x7(3->128) -> BN -> ReLU -> Channels4
    pred_layer        = Conv3x3(64->1)          (log-depth)
    uncertainty_layer = Conv3x3(64->1) -> sigmoid

Each ``ChannelsN`` is a two-branch residual: an identity-resolution
branch and an avg-pool 2x -> inceptions (recursing into Channels(N-1))
-> bilinear 2x upsample branch, summed. ``Inception`` concatenates a
1x1 branch with (1x1 -> kxk) branches; all BNs are affine-free except
the stem BN.

torch state_dict key mapping is mechanical; see
:mod:`consistent_depth_tpu.models.torch_import`.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import TorchBatchNorm, avg_pool_2x, conv, upsample_bilinear_2x

# Inception configs: [[base_out], [k, mid, out], ...]
_A = ((16,), (3, 64, 16), (7, 64, 16), (11, 64, 16))
_BA = ((16,), (3, 32, 16), (7, 32, 16), (11, 32, 16))
_B = ((32,), (3, 32, 32), (5, 32, 32), (7, 32, 32))
_BC = ((32,), (3, 64, 32), (7, 64, 32), (11, 64, 32))
_BB = ((32,), (3, 64, 32), (5, 64, 32), (7, 64, 32))
_D = ((64,), (3, 32, 64), (5, 32, 64), (7, 32, 64))  # on 128-ch input
_E = ((64,), (3, 32, 64), (5, 32, 64), (7, 32, 64))  # on 256-ch input
_F = ((64,), (3, 64, 64), (7, 64, 64), (11, 64, 64))
_G = ((32,), (3, 32, 32), (5, 32, 32), (7, 32, 32))  # on 256-ch input


class Inception(nn.Module):
    """Inception block: concat of a 1x1 branch and (1x1 -> kxk) branches,
    each conv followed by affine-free BN + ReLU.

    All four leading 1x1 convs read the same input, so their compute is
    fused into ONE conv with C_out = base + 3*mid (112-256 lanes vs
    16-64 — separate C_out=16/32 matmuls idle most of the MXU), and
    likewise their BNs and the three output BNs (per-channel statistics
    commute with channel concat — exact, see fused_batch_norm).
    Parameters/batch-stats keep their torch-twin names and shapes via
    ConvParams/BatchNormStats, so checkpoint import is unaffected."""

    config: Tuple[Tuple[int, ...], ...]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from .layers import (BatchNormStats, ConvParams, conv_compute,
                             fused_batch_norm)

        base = self.config[0][0]
        branches = self.config[1:]
        C_in = x.shape[-1]

        front = [ConvParams(base, (1, 1), C_in, name="convs_0_0")()]
        front += [ConvParams(mid, (1, 1), C_in, name=f"convs_{bi}_0")()
                  for bi, (k, mid, out) in enumerate(branches, start=1)]
        y = conv_compute(
            jnp.concatenate([w for w, _ in front], axis=-1),
            jnp.concatenate([b for _, b in front], axis=-1), x)
        stats = [BatchNormStats(base, name="convs_0_1")()]
        stats += [BatchNormStats(mid, name=f"convs_{bi}_1")()
                  for bi, (k, mid, out) in enumerate(branches, start=1)]
        y = nn.relu(
            fused_batch_norm(y, stats, train, self.is_initializing()))

        kouts, off = [], base
        for bi, (k, mid, out) in enumerate(branches, start=1):
            kouts.append(
                conv(out, k, padding=(k - 1) // 2, name=f"convs_{bi}_3")(
                    y[..., off:off + mid]))
            off += mid
        z = jnp.concatenate(kouts, axis=-1)
        stats2 = [BatchNormStats(out, name=f"convs_{bi}_4")()
                  for bi, (k, mid, out) in enumerate(branches, start=1)]
        z = nn.relu(
            fused_batch_norm(z, stats2, train, self.is_initializing()))
        return jnp.concatenate([y[..., :base], z], axis=-1)


# Optional: rematerialize inception blocks in the backward pass (cuts
# HBM traffic ~43% at +30% flops). Measured OFF as faster on v5e for
# this net — the step is conv-utilization-bound, not bandwidth-bound —
# but the knob matters on larger batches/memory-constrained configs.
REMAT_INCEPTION = False


def _branch(x, configs, prefix: str, train: bool, offset: int = 0):
    """A sequence of inception blocks (one list entry of a ChannelsN);
    defined inline so flax names stay flat (list_{i}_{j})."""
    for i, cfg in enumerate(configs):
        mod = Inception
        if REMAT_INCEPTION:
            mod = nn.remat(Inception, static_argnums=(2,))
        x = mod(cfg, name=f"{prefix}_{i + offset}")(x, train)
    return x


class Channels1(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        flat = _branch(x, (_E, _E), "list_0", train)
        y = avg_pool_2x(x)
        y = _branch(y, (_E, _E, _E), "list_1", train, offset=1)
        return flat + upsample_bilinear_2x(y)


class Channels2(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        flat = _branch(x, (_E, _F), "list_0", train)
        y = avg_pool_2x(x)
        y = _branch(y, (_E, _E), "list_1", train, offset=1)
        y = Channels1(name="list_1_3")(y, train)
        y = _branch(y, (_E, _F), "list_1", train, offset=4)
        return flat + upsample_bilinear_2x(y)


class Channels3(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        y = avg_pool_2x(x)
        y = _branch(y, (_B, _D), "list_0", train, offset=1)
        y = Channels2(name="list_0_3")(y, train)
        y = _branch(y, (_E, _G), "list_0", train, offset=4)
        deep = upsample_bilinear_2x(y)
        flat = _branch(x, (_B, _BC), "list_1", train)
        return deep + flat


class Channels4(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        y = avg_pool_2x(x)
        y = _branch(y, (_B, _B), "list_0", train, offset=1)
        y = Channels3(name="list_0_3")(y, train)
        y = _branch(y, (_BB, _BA), "list_0", train, offset=4)
        deep = upsample_bilinear_2x(y)
        flat = _branch(x, (_A,), "list_1", train)
        return deep + flat


class HourglassModel(nn.Module):
    """netG. Input: (B, H, W, 3) BGR images in [0, 1] (the pipeline's
    channel convention, reference loaders/video_dataset.py:48-59).

    Returns (log-depth (B, H, W, 1), confidence (B, H, W, 1))."""

    num_input: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        y = conv(128, 7, padding=3, name="seq_0")(x)
        y = TorchBatchNorm(affine=True, name="seq_1")(y, train)
        y = nn.relu(y)
        y = Channels4(name="seq_3")(y, train)
        # both heads in ONE conv (C_out=1 convs waste 127/128 MXU lanes;
        # parameters keep their torch names via ConvParams)
        from .layers import ConvParams, conv_compute

        wp, bp = ConvParams(1, (3, 3), 64, name="pred_layer")()
        wu, bu = ConvParams(1, (3, 3), 64, name="uncertainty_layer_0")()
        heads = conv_compute(
            jnp.concatenate([wp, wu], axis=-1),
            jnp.concatenate([bp, bu], axis=-1), y, padding=1)
        pred = heads[..., 0:1]
        conf = nn.sigmoid(heads[..., 1:2])
        return pred, conf
