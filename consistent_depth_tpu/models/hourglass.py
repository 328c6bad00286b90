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

import jax
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


def _inception_compute(config, vals, x, train: bool):
    """Purely functional inception block over a values pytree (see
    :class:`InceptionParams`): conv/BN math identical to the original
    per-module formulation, but with the running statistics passed in
    and returned as arrays so the same body can run standalone (one
    block) or inside ``lax.scan`` (a run of identical blocks).

    Returns ``(out, new_stats)`` with ``new_stats = {m1, v1, m2, v2}``
    (concatenated running means/vars of the front and output BNs)."""
    from .layers import conv_compute, fused_batch_norm_pure

    base = config[0][0]
    branches = config[1:]

    y = conv_compute(vals["fw"], vals["fb"], x)
    y, nm1, nv1 = fused_batch_norm_pure(y, vals["m1"], vals["v1"], train)
    y = nn.relu(y)

    kouts, off = [], base
    for bi, (k, mid, out) in enumerate(branches):
        kouts.append(conv_compute(
            vals["bw"][bi], vals["bb"][bi], y[..., off:off + mid],
            padding=(k - 1) // 2))
        off += mid
    z = jnp.concatenate(kouts, axis=-1)
    z, nm2, nv2 = fused_batch_norm_pure(z, vals["m2"], vals["v2"], train)
    z = nn.relu(z)
    out = jnp.concatenate([y[..., :base], z], axis=-1)
    return out, {"m1": nm1, "v1": nv1, "m2": nm2, "v2": nv2}


def _declare_inception(config, C_in: int):
    """Declare one inception block's parameter/stat tree (names and
    shapes identical to the original per-module layout, so checkpoint
    import/export is unaffected). Must run inside the block module's
    compact context. Returns ``(vals, stat_refs)`` where ``vals`` is
    the pytree :func:`_inception_compute` consumes (fused front
    kernel/bias, concatenated running stats, per-branch kxk kernels)
    and ``stat_refs`` the flax variable pairs for writing updated
    running stats back after the compute ran."""
    from .layers import BatchNormStats, ConvParams

    base = config[0][0]
    branches = config[1:]

    front = [ConvParams(base, (1, 1), C_in, name="convs_0_0")()]
    front += [ConvParams(mid, (1, 1), C_in, name=f"convs_{bi}_0")()
              for bi, (k, mid, out) in enumerate(branches, start=1)]
    stats = [BatchNormStats(base, name="convs_0_1")()]
    stats += [BatchNormStats(mid, name=f"convs_{bi}_1")()
              for bi, (k, mid, out) in enumerate(branches, start=1)]
    branch = [ConvParams(out, (k, k), mid, name=f"convs_{bi}_3")()
              for bi, (k, mid, out) in enumerate(branches, start=1)]
    stats2 = [BatchNormStats(out, name=f"convs_{bi}_4")()
              for bi, (k, mid, out) in enumerate(branches, start=1)]

    vals = {
        "fw": jnp.concatenate([w for w, _ in front], axis=-1),
        "fb": jnp.concatenate([b for _, b in front], axis=-1),
        "m1": jnp.concatenate([m.value for m, _ in stats]),
        "v1": jnp.concatenate([v.value for _, v in stats]),
        "bw": tuple(w for w, _ in branch),
        "bb": tuple(b for _, b in branch),
        "m2": jnp.concatenate([m.value for m, _ in stats2]),
        "v2": jnp.concatenate([v.value for _, v in stats2]),
    }
    return vals, (stats, stats2)


class InceptionParams(nn.Module):
    """Parameter-only stand-in for :class:`Inception`: declares the
    identical tree under its own name (it takes the block module's
    place in scanned runs) and returns what :func:`_declare_inception`
    returns — the compute happens in the caller's ``lax.scan``."""

    config: Tuple[Tuple[int, ...], ...]
    in_features: int

    @nn.compact
    def __call__(self):
        return _declare_inception(self.config, self.in_features)


def _write_stats(stat_refs, new_stats) -> None:
    """Scatter updated concatenated running stats back into the
    per-branch BatchNormStats variables (train mode only)."""
    for refs, mkey, vkey in ((stat_refs[0], "m1", "v1"),
                             (stat_refs[1], "m2", "v2")):
        off = 0
        for ra_mean, ra_var in refs:
            c = ra_mean.value.shape[0]
            ra_mean.value = new_stats[mkey][off:off + c]
            ra_var.value = new_stats[vkey][off:off + c]
            off += c


class Inception(nn.Module):
    """Inception block: concat of a 1x1 branch and (1x1 -> kxk) branches,
    each conv followed by affine-free BN + ReLU.

    All four leading 1x1 convs read the same input, so their compute is
    fused into ONE conv with C_out = base + 3*mid (112-256 lanes vs
    16-64 — separate C_out=16/32 matmuls idle most of the MXU), and
    likewise their BNs and the three output BNs (per-channel statistics
    commute with channel concat — exact, see fused_batch_norm_pure).
    Parameters/batch-stats keep their torch-twin names and shapes via
    ConvParams/BatchNormStats, so checkpoint import is unaffected."""

    config: Tuple[Tuple[int, ...], ...]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        vals, stat_refs = _declare_inception(self.config, x.shape[-1])
        out, new_stats = _inception_compute(self.config, vals, x, train)
        if train and not self.is_initializing():
            _write_stats(stat_refs, new_stats)
        return out


# Optional: rematerialize inception blocks in the backward pass (cuts
# HBM traffic ~43% at +30% flops). Measured OFF as faster on v5e for
# this net — the step is conv-utilization-bound, not bandwidth-bound —
# but the knob matters on larger batches/memory-constrained configs.
REMAT_INCEPTION = False

# Runs of CONSECUTIVE identical-config inception blocks execute as one
# lax.scan over their stacked parameters instead of unrolled calls. The
# math and parameter tree are identical; what changes is TPU codegen:
# XLA generates machine code per conv INSTRUCTION (no deduplication —
# measured: 5 identical convs unrolled = 6.05 MiB / 47 s vs scanned =
# 1.42 MiB / 8.9 s, tools/convgrad_codesize.py), and the train step's
# ~300 conv instances are what make its compile cost ~640 s / 304 MiB
# at v5e:2x4 (TOPOLOGY_v5e8.json). The hourglass repeats _B x2 and
# _E x2/x3 back to back; scanning those runs removes 5 of the 20
# compiled inception bodies.
SCAN_REPEATED_BLOCKS = True
# resolution gate for the scanned path (pixels = H*W of the run's
# feature map): scanning trades per-instance codegen for lost
# cross-block fusion, and the trade is resolution-dependent. Measured
# on the chip (train step, bf16, bs 4): scanning the _E runs at
# 28x48/14x24 costs ~0.8 ms/step (noise) while scanning the _B,_B run
# at 112x192 costs ~3 ms/step — so the default gate covers only the
# small-resolution runs; raise SCAN_MAX_PIXELS to trade ~3% step time
# for another ~15% compile/code (see PERF.md round-4 compile section).
SCAN_MIN_PIXELS = 0
SCAN_MAX_PIXELS = 4096


def set_scan_repeated_blocks(flag: bool) -> None:
    """Toggle the scanned-run path (parity tests run both ways)."""
    global SCAN_REPEATED_BLOCKS
    SCAN_REPEATED_BLOCKS = bool(flag)


def _scanned_run(mdl, x, cfg, names, train: bool):
    """Execute ``len(names)`` consecutive identical inception blocks as
    one ``lax.scan`` over their stacked parameters. Requires (and the
    caller guarantees) that the block maps C -> C so the carry shape is
    invariant."""
    decls = [InceptionParams(cfg, x.shape[-1], name=n)() for n in names]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *[vals for vals, _ in decls])

    def body(carry, vals):
        out, new_stats = _inception_compute(cfg, vals, carry, train)
        return out, new_stats

    if REMAT_INCEPTION:
        body = jax.checkpoint(body)
    x, new_stats = jax.lax.scan(body, x, stacked)
    if train and not mdl.is_initializing():
        for t, (_, stat_refs) in enumerate(decls):
            _write_stats(stat_refs, jax.tree_util.tree_map(
                lambda a: a[t], new_stats))
    return x


def _branch(mdl, x, configs, prefix: str, train: bool, offset: int = 0):
    """A sequence of inception blocks (one list entry of a ChannelsN);
    defined inline so flax names stay flat (list_{i}_{j}). Consecutive
    identical configs run as one scanned body when the channel count is
    carried (see SCAN_REPEATED_BLOCKS)."""
    base_out = lambda cfg: cfg[0][0] + sum(out for _, _, out in cfg[1:])  # noqa: E731
    i = 0
    configs = list(configs)
    while i < len(configs):
        cfg = configs[i]
        j = i
        while j + 1 < len(configs) and configs[j + 1] == cfg:
            j += 1
        n = j - i + 1
        px = x.shape[1] * x.shape[2]
        if (n > 1 and SCAN_REPEATED_BLOCKS
                and SCAN_MIN_PIXELS <= px <= SCAN_MAX_PIXELS
                and x.shape[-1] == base_out(cfg)):
            names = [f"{prefix}_{t + offset}" for t in range(i, j + 1)]
            x = _scanned_run(mdl, x, cfg, names, train)
        else:
            for t in range(i, j + 1):
                mod = Inception
                if REMAT_INCEPTION:
                    mod = nn.remat(Inception, static_argnums=(2,))
                x = mod(cfg, name=f"{prefix}_{t + offset}")(x, train)
        i = j + 1
    return x


class Channels1(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        flat = _branch(self, x, (_E, _E), "list_0", train)
        y = avg_pool_2x(x)
        y = _branch(self, y, (_E, _E, _E), "list_1", train, offset=1)
        return flat + upsample_bilinear_2x(y)


class Channels2(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        flat = _branch(self, x, (_E, _F), "list_0", train)
        y = avg_pool_2x(x)
        y = _branch(self, y, (_E, _E), "list_1", train, offset=1)
        y = Channels1(name="list_1_3")(y, train)
        y = _branch(self, y, (_E, _F), "list_1", train, offset=4)
        return flat + upsample_bilinear_2x(y)


class Channels3(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        y = avg_pool_2x(x)
        y = _branch(self, y, (_B, _D), "list_0", train, offset=1)
        y = Channels2(name="list_0_3")(y, train)
        y = _branch(self, y, (_E, _G), "list_0", train, offset=4)
        deep = upsample_bilinear_2x(y)
        flat = _branch(self, x, (_B, _BC), "list_1", train)
        return deep + flat


class Channels4(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        y = avg_pool_2x(x)
        y = _branch(self, y, (_B, _B), "list_0", train, offset=1)
        y = Channels3(name="list_0_3")(y, train)
        y = _branch(self, y, (_BB, _BA), "list_0", train, offset=4)
        deep = upsample_bilinear_2x(y)
        flat = _branch(self, x, (_A,), "list_1", train)
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
