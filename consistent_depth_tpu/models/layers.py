"""TPU-first neural-net building blocks with exact torch semantics.

Everything is NHWC (XLA's preferred conv layout on TPU). Numerical
contracts honored so torch-pretrained weights import losslessly:

- ``TorchBatchNorm``: torch's running-stat update (unbiased variance in
  the running update, biased in normalization, torch momentum 0.1).
- ``upsample_bilinear_2x`` / ``resize_bilinear`` / ``resize_bicubic``:
  torch ``interpolate`` parity for both align_corners settings, built as
  *separable dense interpolation matmuls* — static interpolation
  matrices contract over H then W on the MXU instead of gathers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Global compute-dtype policy. f32 params are cast per-op; BN statistics
# are always computed in f32 (see TorchBatchNorm). bfloat16 doubles MXU
# throughput on TPU; parity tests run in the default f32.
_COMPUTE_DTYPE = None  # None -> infer (f32)


def set_compute_dtype(dtype) -> None:
    """Set the conv/matmul compute dtype (None | jnp.bfloat16 | ...)."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    return _COMPUTE_DTYPE


class TorchBatchNorm(nn.Module):
    """BatchNorm2d matching torch semantics bit-for-bit.

    - training: normalize by biased batch variance; update running stats
      with *unbiased* variance: ra = (1-m)*ra + m*batch (m=0.1).
    - eval: normalize by running stats.
    - ``affine=False`` -> no scale/bias parameters (used by the
      MannequinChallenge inception blocks).
    """

    affine: bool = True
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        C = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32))

        if train:
            # one-pass statistics (E[x^2] - E[x]^2, like torch's native
            # kernels): reads x once instead of twice — the train step
            # is HBM-bandwidth-bound, so BN traffic matters
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=(0, 1, 2))
            mean_sq = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean)
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value
                    + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
            var.astype(x.dtype) + jnp.asarray(self.eps, x.dtype))
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (C,))
            bias = self.param("bias", nn.initializers.zeros, (C,))
            y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
        return y


# ---------------------------------------------------------------------------
# Space-to-depth convolution
# ---------------------------------------------------------------------------
#
# A stride-1 kxk conv with few output channels uses only C_out/128 of the
# MXU's lanes; the hourglass's inception branches (C_out in {16, 32}) run
# at 3-12 TFLOPS on v5e because of it. Space-to-depth by factor s is an
# EXACT reformulation: x (B,H,W,C) -> (B,H/s,W/s,s^2 C), the kernel
# shrinks to kk = floor((s-1+p)/s)+ceil(p/s)+1 taps and the channels
# grow to (s^2 C_in, s^2 C_out) with structured zeros. Measured on chip
# (tools/mxu_bench.py): 3-8x on the k>=7 high-resolution convs.

_S2D_ENABLED = True


def set_s2d_enabled(flag: bool) -> None:
    """Globally toggle the space-to-depth conv path (parity tests run
    both ways; production default is on)."""
    global _S2D_ENABLED
    _S2D_ENABLED = flag


@functools.lru_cache(maxsize=None)
def _s2d_gather_indices(k: int, s: int):
    """Kernel-row gather map for the s2d transform.

    Returns (KI (kk, s, s) int32 with value k meaning "zero", kk, pad):
    KI[r, d, o] is the original kernel tap feeding s2d-tap r for output
    phase d and input phase o.
    """
    p = (k - 1) // 2
    lo = -((p + s - 1) // s)
    hi = (s - 1 + p) // s
    kk = hi - lo + 1
    r = np.arange(kk)[:, None, None]
    d = np.arange(s)[None, :, None]
    o = np.arange(s)[None, None, :]
    KI = (r + lo) * s + o - d + p
    KI = np.where((KI >= 0) & (KI < k), KI, k)
    # host numpy only: a cached jnp array created under jit would leak
    # its tracer into later traces (same rule as _interp_matrices)
    return KI.astype(np.int32), kk, -lo


def s2d_kernel(w: jnp.ndarray, s: int):
    """Transform a (k, k, C_in, C_out) kernel into its space-to-depth
    equivalent (kk, kk, s^2 C_in, s^2 C_out). Pure gathers — cheap and
    differentiable (the VJP is a scatter-add over the small kernel)."""
    k, _, Ci, Co = w.shape
    KI, kk, pad = _s2d_gather_indices(k, s)
    z_row = jnp.zeros((1,) + w.shape[1:], w.dtype)
    t = jnp.concatenate([w, z_row], axis=0)[KI]     # (kk,s,s, k,Ci,Co)
    z_col = jnp.zeros(t.shape[:3] + (1,) + t.shape[4:], w.dtype)
    t = jnp.concatenate([t, z_col], axis=3)[:, :, :, KI]
    # axes: (ri, di, oi, rj, dj, oj, ci, co) -> (ri, rj, oi, oj, ci, di, dj, co)
    t = t.transpose(0, 3, 2, 5, 6, 1, 4, 7)
    return t.reshape(kk, kk, s * s * Ci, s * s * Co), kk, pad


def space_to_depth(x: jnp.ndarray, s: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // s, s, W // s, s, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // s, W // s, s * s * C)


def depth_to_space(x: jnp.ndarray, s: int) -> jnp.ndarray:
    B, H, W, C2 = x.shape
    c = C2 // (s * s)
    x = x.reshape(B, H, W, s, s, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * s, W * s, c)


def _s2d_factor(H: int, W: int, C_in: int, k: int, C_out: int) -> int:
    """Measured policy (tools/mxu_bench.py on v5e, bf16): where the s2d
    reformulation beats XLA's native conv, and by which factor s.
    Returns 0 to keep the native conv.

    Cost model: predicted time ratio = FLOP inflation of the padded
    kernel over the MXU-utilisation gain (lanes x contraction depth);
    accept only clear predicted wins, and only where the spatial extent
    is large enough that the s2d transposes stay negligible (validated
    against the on-chip measurements in tools/mxu_bench.py)."""
    if not _S2D_ENABLED or k < 2 or H * W < 112 * 192:
        return 0
    p = (k - 1) // 2
    best_s, best_score = 0, 0.75   # require a >=25% predicted win
    for s in (2, 4):
        if H % s or W % s:
            continue
        kk = (s - 1 + p) // s + (p + s - 1) // s + 1
        inflation = (kk * kk * s * s) / (k * k)
        lane_gain = min(s * s * C_out, 128) / min(C_out, 128)
        depth_gain = min(s * s * C_in, 128) / min(C_in, 128)
        score = inflation / (lane_gain * depth_gain)
        if score < best_score:
            best_s, best_score = s, score
    return best_s


def _conv_raw(w, x, s: int, stride: int, padding: int, dilation: int):
    """One conv under formulation ``s`` (0 = XLA native, >0 = the
    space-to-depth reformulation), dtypes already cast, no bias."""
    if s:
        w2, kk, pad = s2d_kernel(w, s)
        y = jax.lax.conv_general_dilated(
            space_to_depth(x, s), w2, (1, 1),
            [(pad, kk - 1 - pad), (pad, kk - 1 - pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return depth_to_space(y, s)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bwd_policy(H: int, W: int, C_in: int, k: int, C_out: int,
                s_fwd: int) -> Tuple[int, int]:
    """Measured BACKWARD formulation policy (tools/bwd_mxu_bench.py on
    v5e, bf16) for the eligible stride-1 same-padding odd-k conv class.

    Returns ``(gx_s, gw_s)``:

    - ``gx_s``: -1 — compute grad-input by autodiff through the
      forward's formulation (inherit); >= 0 — compute it as its OWN
      stride-1 same-padding conv of the cotangent with the
      flipped/transposed kernel under s2d factor ``gx_s`` (0 = native).
      The re-policied conv sees the gx geometry: lanes = C_in,
      contraction depth = C_out.
    - ``gw_s``: -1 — inherit; 0 — grad-weight through the NATIVE conv
      (the s2d grad-weight computes the inflated kernel's gradient and
      scatter-adds it back onto the compact taps).

    Measured rule (full 44-shape hourglass table, PERF.md):

    - grad-input: native wins ONLY for k=3 with C_out >= 16 (A.3 1.6x,
      BC.3 1.5x; the s2d inflation is worst there, kk^2 s^2/k^2 = 4 —
      but a single-channel head like pred3 still gains more from s2d
      lanes than the inflation costs); everywhere else the inherited
      s2d formulation wins (stem7 3.6x, A.11 3.8x).
      Re-expressing gx as its own conv with an independently-chosen
      factor measured IDENTICAL to inheriting the forward's (gx_repol
      column) — autodiff's transpose already yields that conv — so
      gx_s is only ever 0 (native) or -1 (inherit).
    - grad-weight: the s2d kernel-gradient is kk^2 s^4/k^2 times the
      compact one plus a scatter-add back; native wins for k=3
      (2-3.5x), for s_fwd=4 (the s^4=256x blow-up: stem7 3.3x,
      A.7 1.26x), and for k in {5,7} with C_in >= 64 (BC.7/BB.5,
      ~1.1-1.2x); inherited s2d wins for k=11 (A.11 1.6x, BC.11 1.2x)
      and k in {5,7} with C_in = 32 (B.5 1.3x, B.7 1.5x).
    """
    if s_fwd <= 0:
        return -1, -1
    # k=3 native-gx exception: a tiny C_out (pred3's single-channel
    # head) gives s2d a 128x lane gain that beats the 4x inflation
    gx_s = 0 if (k == 3 and C_out >= 16) else -1
    gw_s = 0 if (k == 3 or s_fwd == 4
                 or (k in (5, 7) and C_in >= 64)) else -1
    return gx_s, gw_s


# ---------------------------------------------------------------------------
# Fused Pallas s2d conv (ops/s2d_conv.py): same contraction as the XLA
# s2d path but the expanded layout lives only in VMEM staging, never in
# HBM. Off by default; enabled per measurement (tools/s2d_layout_bench).
# ---------------------------------------------------------------------------

_PALLAS_S2D = False


def set_pallas_s2d(flag) -> None:
    """Toggle the fused Pallas s2d conv path. True enables it on TPU;
    the string "force" also routes on CPU (interpret-mode kernel —
    parity tests only)."""
    global _PALLAS_S2D
    _PALLAS_S2D = flag


def _pallas_co_split(k: int, s: int, ci: int, co: int, itemsize: int,
                     budget: int = 7 * 2**20) -> int:
    """Split factor over the output channels that keeps one s2d weight
    block inside the kernel's VMEM budget."""
    KI, kk, _ = _s2d_gather_indices(k, s)
    split = 1
    while (kk * kk * (s * s * ci) * (s * s * co) * itemsize // split
           > budget and co % (2 * split) == 0):
        split *= 2
    return split


def _pallas_eligible(x, k: int, s: int) -> bool:
    if not _PALLAS_S2D or s <= 0:
        return False
    if (_PALLAS_S2D != "force"
            and jax.default_backend() in ("cpu", "gpu")):
        return False
    H, W = x.shape[1], x.shape[2]
    return H % (s * 8) == 0 and W % s == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _conv_pallas(cfg, w, x):
    """s2d conv whose forward (and inherited grad-input) run the fused
    Pallas kernel; grad-weight keeps the measured XLA formulation.
    cfg = (s_fwd, gx_s, gw_s, padding) as in :func:`_conv_override`."""
    from ..ops.s2d_conv import s2d_conv_pallas

    s_fwd = cfg[0]
    split = _pallas_co_split(
        w.shape[0], s_fwd, w.shape[2], w.shape[3], x.dtype.itemsize)
    return s2d_conv_pallas(x, w, s=s_fwd, co_split=split)


def _conv_pallas_fwd(cfg, w, x):
    return _conv_pallas(cfg, w, x), (w, x)


def _conv_pallas_bwd(cfg, res, ct):
    from ..ops.s2d_conv import s2d_conv_pallas

    s_fwd, gx_s, gw_s, padding = cfg
    w, x = res

    # grad-input: its own conv of the cotangent with the flipped/
    # channel-swapped kernel (identical to autodiff's transpose —
    # PERF.md gx_repol). Inherit (gx_s < 0) -> fused kernel at the
    # forward's factor; native exception (gx_s == 0) -> XLA.
    wf = w[::-1, ::-1].transpose(0, 1, 3, 2)
    if gx_s < 0 and _pallas_eligible(ct, w.shape[0], s_fwd):
        split = _pallas_co_split(
            wf.shape[0], s_fwd, wf.shape[2], wf.shape[3],
            ct.dtype.itemsize)
        dx = s2d_conv_pallas(ct, wf, s=s_fwd, co_split=split)
    else:
        dx = _conv_raw(wf, ct, max(gx_s, 0), 1, padding, 1)

    # grad-weight: measured XLA formulation (native for gw_s == 0,
    # the s2d kernel-gradient otherwise)
    s_gw = s_fwd if gw_s < 0 else gw_s
    _, pull = jax.vjp(
        lambda w_: _conv_raw(w_, x, s_gw, 1, padding, 1), w)
    (dw,) = pull(ct)
    return dw, dx


_conv_pallas.defvjp(_conv_pallas_fwd, _conv_pallas_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _conv_override(cfg, w, x):
    """Conv whose forward/grad-input/grad-weight formulations are
    chosen independently. cfg = (s_fwd, gx_s, gw_s, padding) with the
    gx_s/gw_s conventions of :func:`_bwd_policy` (stride 1, dilation 1,
    odd k, symmetric same padding — the s2d-eligible class)."""
    s_fwd, _, _, padding = cfg
    return _conv_raw(w, x, s_fwd, 1, padding, 1)


def _conv_override_fwd(cfg, w, x):
    return _conv_override(cfg, w, x), (w, x)


def _conv_override_bwd(cfg, res, ct):
    s_fwd, gx_s, gw_s, padding = cfg
    w, x = res

    if gx_s < 0:
        _, pull = jax.vjp(
            lambda x_: _conv_raw(w, x_, s_fwd, 1, padding, 1), x)
        (dx,) = pull(ct)
    else:
        # grad-input as its own conv: dL/dx[r] = sum_q w[q] ct[r-q+p]
        # == same-padding conv of ct with the flipped kernel carrying
        # swapped channel roles (k, k, C_out, C_in); exact for the
        # eligible class, under its own s2d factor gx_s
        wf = w[::-1, ::-1].transpose(0, 1, 3, 2)
        dx = _conv_raw(wf, ct, gx_s, 1, padding, 1)

    s_gw = s_fwd if gw_s < 0 else gw_s
    _, pull = jax.vjp(
        lambda w_: _conv_raw(w_, x, s_gw, 1, padding, 1), w)
    (dw,) = pull(ct)
    return dw, dx


_conv_override.defvjp(_conv_override_fwd, _conv_override_bwd)


def conv_compute(kernel, bias, x, stride: int = 1, padding: int = 0,
                 dilation: int = 1):
    """The conv execution path shared by :class:`TorchConv` and fused
    call sites (e.g. the hourglass's merged prediction heads): casts to
    the compute dtype and picks the space-to-depth fast path — and,
    independently, the backward formulations — when the measured
    policies say so."""
    k = kernel.shape[0]
    dt = _COMPUTE_DTYPE or x.dtype
    x = x.astype(dt)
    w = kernel.astype(dt)

    s = 0
    gx_s = gw_s = -1
    # odd kernels only: _s2d_gather_indices' tap-range formula
    # (hi = (s-1+p)//s) assumes symmetric padding p = (k-1)/2 exactly,
    # which only holds for odd k — an even kernel would silently drop
    # taps and change the output shape instead of falling back
    if (stride == 1 and dilation == 1 and k % 2 == 1
            and kernel.shape[0] == kernel.shape[1]
            and padding == (k - 1) // 2 and x.ndim == 4):
        s = _s2d_factor(x.shape[1], x.shape[2], x.shape[-1], k,
                        kernel.shape[-1])
        if _S2D_ENABLED:
            gx_s, gw_s = _bwd_policy(
                x.shape[1], x.shape[2], x.shape[-1], k,
                kernel.shape[-1], s)

    if s > 0 and _pallas_eligible(x, k, s):
        y = _conv_pallas((s, gx_s, gw_s, padding), w, x)
    elif gx_s >= 0 or gw_s >= 0:
        y = _conv_override((s, gx_s, gw_s, padding), w, x)
    else:
        y = _conv_raw(w, x, s, stride, padding, dilation)
    if bias is not None:
        y = y + bias.astype(dt)
    return y


class ConvParams(nn.Module):
    """Parameter-only twin of :class:`TorchConv` (identical tree:
    "kernel" HWIO + "bias"), for call sites that fuse several convs'
    compute while keeping checkpoint-compatible parameter naming."""

    features: int
    kernel_size: Tuple[int, int]
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size[0], self.kernel_size[1],
             self.in_features, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class BatchNormStats(nn.Module):
    """batch_stats-only twin of :class:`TorchBatchNorm` (affine-free):
    declares the same "mean"/"var" running-stat variables and returns
    them, for call sites that fuse several BNs' compute over
    channel-concatenated features."""

    features: int

    @nn.compact
    def __call__(self):
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        return ra_mean, ra_var


def fused_batch_norm_pure(x, ra_mean, ra_var, train: bool,
                          momentum: float = 0.1, eps: float = 1e-5):
    """Purely functional affine-free torch BatchNorm over channel-
    concatenated features: takes the concatenated running stats as
    ARRAYS and returns ``(y, new_ra_mean, new_ra_var)`` instead of
    writing flax variables — usable inside ``lax.scan`` bodies (the
    scanned inception runs in models/hourglass.py). Math identical to
    :func:`fused_batch_norm`."""
    if train:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2))
        mean_sq = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_mean = (1 - momentum) * ra_mean + momentum * mean
        new_var = (1 - momentum) * ra_var + momentum * unbiased
    else:
        mean, var = ra_mean, ra_var
        new_mean, new_var = ra_mean, ra_var
    y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
        var.astype(x.dtype) + jnp.asarray(eps, x.dtype))
    return y, new_mean, new_var


def fused_batch_norm(x, stats, train: bool, initializing: bool,
                     momentum: float = 0.1, eps: float = 1e-5):
    """Affine-free torch BatchNorm over channel-concatenated features
    whose running stats live in several :class:`BatchNormStats` modules.

    Per-channel statistics commute with channel concatenation, so one
    fused normalization (one reduction pass over the big tensor instead
    of one per branch) is exactly the per-slice torch computation.
    ``stats`` is the list of (ra_mean, ra_var) variable pairs in channel
    order; running stats are updated slice-wise in train mode."""
    mean = jnp.concatenate([m.value for m, _ in stats])
    var = jnp.concatenate([v.value for _, v in stats])
    y, new_mean, new_var = fused_batch_norm_pure(
        x, mean, var, train, momentum=momentum, eps=eps)
    if train and not initializing:
        off = 0
        for ra_mean, ra_var in stats:
            c = ra_mean.value.shape[0]
            ra_mean.value = new_mean[off:off + c]
            ra_var.value = new_var[off:off + c]
            off += c
    return y


class TorchConv(nn.Module):
    """torch ``nn.Conv2d`` twin (explicit symmetric zero padding) with a
    space-to-depth fast path for MXU-hostile shapes. Parameter names and
    shapes are identical to ``flax.linen.Conv`` ("kernel" HWIO, "bias"),
    so checkpoint import/export is unaffected by the compute path."""

    features: int
    kernel_size: Tuple[int, int]
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size[0]
        C_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size[0], self.kernel_size[1], C_in, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        return conv_compute(
            kernel, bias, x, stride=self.stride, padding=self.padding,
            dilation=self.dilation)


def conv(
    features: int,
    kernel: int | Tuple[int, int],
    stride: int = 1,
    padding: int = 0,
    use_bias: bool = True,
    name: Optional[str] = None,
    dilation: int = 1,
) -> TorchConv:
    """torch ``nn.Conv2d`` equivalent (explicit symmetric zero padding)."""
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    return TorchConv(
        features=features,
        kernel_size=kernel,
        stride=stride,
        padding=padding,
        dilation=dilation,
        use_bias=use_bias,
        name=name,
    )


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """torch ``nn.AvgPool2d(2)`` (even input dims)."""
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


def max_pool(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    """torch ``nn.MaxPool2d`` with symmetric zero-entry -inf padding."""
    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
    )


# ---------------------------------------------------------------------------
# Resizes as separable interpolation matmuls
# ---------------------------------------------------------------------------

def _linear_weights(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) dense 1-D bilinear interpolation matrix with
    torch ``interpolate`` source-position semantics."""
    A = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
        src = min(max(src, 0.0), in_size - 1.0)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        A[i, lo] += 1.0 - w
        A[i, hi] += w
    return A


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch/openCV cubic convolution kernel (A = -0.75)."""
    t = np.abs(t)
    out = np.zeros_like(t)
    m1 = t <= 1
    out[m1] = (a + 2) * t[m1] ** 3 - (a + 3) * t[m1] ** 2 + 1
    m2 = (t > 1) & (t < 2)
    out[m2] = a * t[m2] ** 3 - 5 * a * t[m2] ** 2 + 8 * a * t[m2] - 4 * a
    return out


def _cubic_weights(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) dense 1-D bicubic matrix, torch parity
    (border coefficients folded onto the clamped edge samples)."""
    A = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
        lo = int(np.floor(src))
        taps = np.arange(lo - 1, lo + 3)
        w = _cubic_kernel(src - taps)
        for tap, wt in zip(taps, w):
            A[i, min(max(tap, 0), in_size - 1)] += wt
    return A


@functools.lru_cache(maxsize=None)
def _interp_matrices(in_hw, out_hw, mode: str, align_corners: bool):
    # cache host numpy only: jnp conversion must happen per-trace (a
    # cached device array created inside jit would leak its tracer)
    fn = _linear_weights if mode == "linear" else _cubic_weights
    Ah = fn(in_hw[0], out_hw[0], align_corners)
    Aw = fn(in_hw[1], out_hw[1], align_corners)
    return Ah, Aw


RESIZE_PRECISION = "highest"  # tests/parity want exactness; perf path
# can relax via set_resize_precision
def set_resize_precision(p) -> None:
    global RESIZE_PRECISION
    RESIZE_PRECISION = p


def _resize(x: jnp.ndarray, out_hw, mode: str, align_corners: bool):
    Ah, Aw = _interp_matrices(x.shape[1:3], tuple(out_hw), mode, align_corners)
    dt = x.dtype
    Ah = jnp.asarray(Ah, dtype=dt)
    Aw = jnp.asarray(Aw, dtype=dt)
    p = RESIZE_PRECISION
    y = jnp.einsum("oh,bhwc->bowc", Ah, x, precision=p)
    return jnp.einsum("ow,bhwc->bhoc", Aw, y, precision=p)


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = False):
    """torch ``F.interpolate(mode='bilinear')`` for NHWC via matmuls."""
    return _resize(x, out_hw, "linear", align_corners)


def resize_bicubic(x: jnp.ndarray, out_hw, align_corners: bool = False):
    """torch ``F.interpolate(mode='bicubic')`` for NHWC via matmuls."""
    return _resize(x, out_hw, "cubic", align_corners)


def upsample_bilinear_2x(x: jnp.ndarray) -> jnp.ndarray:
    """torch ``nn.UpsamplingBilinear2d(scale_factor=2)``
    (= align_corners=True)."""
    H, W = x.shape[1:3]
    return resize_bilinear(x, (2 * H, 2 * W), align_corners=True)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """torch ``F.interpolate(scale_factor=2, mode='nearest')``."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
