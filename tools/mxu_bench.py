"""Microbenchmark: achieved TFLOPS of every conv shape in the hourglass
hot loop (reference hot loop: depth_fine_tuning.py:261-304; architecture
mannequin_challenge models/hourglass.py), plus candidate TPU-friendly
re-formulations of the worst offenders.

The round-1 train step achieved ~15 TFLOPS vs 118 TFLOPS on a plain bf16
matmul on the same chip. Hypothesis: the inception branch convs with
C_out in {16, 32, 64} use only C_out/128 of the MXU lanes. This script
measures each unique (H, W, C_in, k, C_out) conv in the net and, for the
bad ones, variants:

  xla     : plain lax.conv_general_dilated NHWC (what flax nn.Conv emits)
  s2d<s>  : space-to-depth by factor s (exact reformulation: channels
            x s^2, kernel shrinks to ceil((k - 1 + s)/s), structured-
            zero weights)

Usage: python tools/mxu_bench.py [--iters 30] [--dtype bf16]
Prints one JSON line per measurement.
"""

import argparse
import functools
import json
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, w, x, iters):
    """Steady-state seconds/iter of ``fn(w, x)``. Chains iterations by
    perturbing the (small) weights with the carried scalar, so the
    device cannot overlap or hoist iterations while per-iteration
    overhead stays tiny; value-fetch is the only honest barrier on the
    axon platform."""
    def make_loop(n):
        @jax.jit
        def loop(w, x):
            def body(c, _):
                # 1e-30*c is a real multiply (not foldable) that keeps
                # each iteration data-dependent on the previous one
                y = fn(w * (1.0 + 1e-30 * c).astype(w.dtype), x)
                return jnp.mean(y).astype(jnp.float32), None
            c, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return c
        return loop

    # slope timing: t(3n) - t(n) over 2n iterations cancels the constant
    # per-call cost (RPC round-trip to the remote chip is ~tens of ms)
    lo, hi = make_loop(iters), make_loop(3 * iters)
    np.asarray(jax.device_get(lo(w, x)))
    np.asarray(jax.device_get(hi(w, x)))
    t0 = time.perf_counter()
    np.asarray(jax.device_get(lo(w, x)))
    t1 = time.perf_counter()
    np.asarray(jax.device_get(hi(w, x)))
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / (2 * iters)


def conv_xla(w, x, stride=1):
    k = w.shape[0]
    pad = (k - 1) // 2
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d(x, s):
    B, H, W, C = x.shape
    x = x.reshape(B, H // s, s, W // s, s, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // s, W // s, s * s * C)


def conv_s2d_weights(w, s):
    """Exact space-to-depth reformulation of a stride-1 kxk conv.

    Output block pixel (di, dj) at s2d position (i, j) equals the
    original conv at (i*s+di, j*s+dj), which reads original rows
    i*s+di-p .. i*s+di+p. In s2d space that spans rows
    floor((di-p)/s)+i .. floor((di+p)/s)+i, a window of size
    kk = floor((s-1+p)/s) + floor(p/s) + 1 <= ceil((k-1+s)/s).
    """
    k, _, C_in, C_out = w.shape
    p = (k - 1) // 2
    lo = -((p - 0 + s - 1) // s)          # floor((0-p)/s)
    hi = (s - 1 + p) // s                 # floor((s-1+p)/s)
    kk = hi - lo + 1
    W2 = np.zeros((kk, kk, s * s * C_in, s * s * C_out), w.dtype)
    for di in range(s):
        for dj in range(s):
            for ki in range(k):
                for kj in range(k):
                    # original input row = i*s + di - p + ki
                    ri, oi = divmod(di - p + ki, s)
                    rj, oj = divmod(dj - p + kj, s)
                    W2[ri - lo, rj - lo,
                       (oi * s + oj) * C_in:(oi * s + oj + 1) * C_in,
                       (di * s + dj) * C_out:(di * s + dj + 1) * C_out] = \
                        w[ki, kj]
    return W2, kk, -lo


def conv_s2d(w2, x, s, kk, pad, c_out):
    """w2 is the pre-transformed (kk, kk, s*s*C_in, s*s*C_out) kernel;
    the input/output space-to-depth transposes run inside (they are part
    of the honest cost of this formulation)."""
    x2 = s2d(x, s)
    y2 = lax.conv_general_dilated(
        x2, w2, (1, 1), [(pad, kk - 1 - pad), (pad, kk - 1 - pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    B, H2, Wd, _ = y2.shape
    y = y2.reshape(B, H2, Wd, s, s, c_out).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H2 * s, Wd * s, c_out)


def conv_im2col(w_flat, x, k):
    """kxk conv as explicit im2col patches + one dense dot: contraction
    depth k*k*C_in instead of the per-tap C_in the native conv exposes.
    Only plausible when C_in is tiny (the stem's C_in=3): the patch
    tensor inflates HBM traffic by k^2."""
    p = (k - 1) // 2
    patches = lax.conv_general_dilated_patches(
        x, (k, k), (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.einsum("bhwi,io->bhwo", patches, w_flat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    from consistent_depth_tpu.utils.jit_cache import (
        enable_persistent_jit_cache,
    )

    enable_persistent_jit_cache()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    # (tag, H, W, C_in, k, C_out, count_in_net) — every unique conv shape
    # in HourglassModel at the demo feed 224x384, batch 8 images.
    B = 8
    shapes = [
        ("stem7", 224, 384, 3, 7, 128, 1),
        # _A at full res (Channels4 flat branch)
        ("A.1x1", 224, 384, 128, 1, 16, 1),
        ("A.mid", 224, 384, 128, 1, 64, 3),
        ("A.3", 224, 384, 64, 3, 16, 1),
        ("A.7", 224, 384, 64, 7, 16, 1),
        ("A.11", 224, 384, 64, 11, 16, 1),
        # _B at 112x192 (Channels4 pooled, Channels3 flat uses _B too)
        ("B.1x1", 112, 192, 128, 1, 32, 4),
        ("B.mid", 112, 192, 128, 1, 32, 12),
        ("B.3", 112, 192, 32, 3, 32, 4),
        ("B.5", 112, 192, 32, 5, 32, 4),
        ("B.7", 112, 192, 32, 7, 32, 4),
        # _BC/_BB at 112x192 on 256-ch input, mid 64, out 32
        ("BC.1x1", 112, 192, 256, 1, 32, 2),
        ("BC.mid", 112, 192, 256, 1, 64, 6),
        ("BC.3", 112, 192, 64, 3, 32, 2),
        ("BC.7", 112, 192, 64, 7, 32, 2),
        ("BC.11", 112, 192, 64, 11, 32, 1),
        ("BB.5", 112, 192, 64, 5, 32, 1),
        # _D at 56x96 on 128-ch (Channels3 pooled first)
        ("D.1x1", 56, 96, 128, 1, 64, 1),
        ("D.mid", 56, 96, 128, 1, 32, 3),
        ("D.3", 56, 96, 32, 3, 64, 1),
        ("D.5", 56, 96, 32, 5, 64, 1),
        ("D.7", 56, 96, 32, 7, 64, 1),
        # _E on 256-ch at 56x96 / 28x48 / 14x24
        ("E56.1x1", 56, 96, 256, 1, 64, 3),
        ("E56.mid", 56, 96, 256, 1, 32, 9),
        ("E56.3", 56, 96, 32, 3, 64, 3),
        ("E56.5", 56, 96, 32, 5, 64, 3),
        ("E56.7", 56, 96, 32, 7, 64, 3),
        ("E28.1x1", 28, 48, 256, 1, 64, 4),
        ("E28.mid", 28, 48, 256, 1, 32, 12),
        ("E28.3", 28, 48, 32, 3, 64, 4),
        ("E28.5", 28, 48, 32, 5, 64, 4),
        ("E28.7", 28, 48, 32, 7, 64, 4),
        ("E14.1x1", 14, 24, 256, 1, 64, 5),
        ("E14.mid", 14, 24, 256, 1, 32, 15),
        ("E14.3", 14, 24, 32, 3, 64, 5),
        ("E14.5", 14, 24, 32, 5, 64, 5),
        ("E14.7", 14, 24, 32, 7, 64, 5),
        # _F at 28x48 on 256ch, mid 64 out 64; _G at 56x96 on 256ch
        ("F.3", 28, 48, 64, 3, 64, 1),
        ("F.7", 28, 48, 64, 7, 64, 1),
        ("F.11", 28, 48, 64, 11, 64, 1),
        ("G.3", 56, 96, 32, 3, 32, 1),
        ("G.5", 56, 96, 32, 5, 32, 1),
        ("G.7", 56, 96, 32, 7, 32, 1),
        # output heads
        ("pred3", 224, 384, 64, 3, 1, 2),
    ]
    if args.quick:
        shapes = [s for s in shapes if s[0] in
                  ("stem7", "A.11", "A.7", "B.7", "BC.11", "E56.7", "F.11",
                   "A.mid", "BC.mid")]

    rng = np.random.default_rng(0)
    total_flops = 0.0
    total_time = {"xla": 0.0, "best": 0.0}
    rows = []
    for tag, H, W, C_in, k, C_out, count in shapes:
        x = jnp.asarray(rng.standard_normal((B, H, W, C_in)), dt)
        w_np = (rng.standard_normal((k, k, C_in, C_out)) * 0.05).astype(
            np.float32)
        w = jnp.asarray(w_np, dt)
        flops = 2.0 * B * H * W * k * k * C_in * C_out

        res = {}
        res["xla"] = timed(conv_xla, w, x, args.iters)
        if k > 1 and C_in <= 4:
            # stem-class conv: contraction depth k*C_in per tap row is
            # the bottleneck; im2col exposes the full k*k*C_in depth
            w_flat = jnp.asarray(
                w_np.reshape(k * k * C_in, C_out), dt)
            res["im2col"] = timed(
                functools.partial(conv_im2col, k=k), w_flat, x, args.iters)
        if k > 1 and C_out <= 128 and H % 4 == 0 and W % 4 == 0:
            for s in (2, 4):
                try:
                    w2_np, kk, pad = conv_s2d_weights(w_np, s)
                    w2 = jnp.asarray(w2_np, dt)
                    fn = functools.partial(
                        conv_s2d, s=s, kk=kk, pad=pad, c_out=C_out)
                    res[f"s2d{s}"] = timed(fn, w2, x, args.iters)
                except Exception:  # noqa: BLE001
                    res[f"s2d{s}"] = None
        best = min(v for v in res.values() if v)
        row = {
            "conv": tag, "shape": [B, H, W, C_in, k, C_out], "count": count,
            "gflop": round(flops / 1e9, 2),
            **{m: (round(v * 1e6, 1) if v else None) for m, v in res.items()},
            "tflops_xla": round(flops / res["xla"] / 1e12, 1),
            "tflops_best": round(flops / best / 1e12, 1),
            "best": min((v, m) for m, v in res.items() if v)[1],
        }
        rows.append(row)
        total_flops += flops * count
        total_time["xla"] += res["xla"] * count
        total_time["best"] += best * count
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "summary": "fwd conv total",
        "tflop": round(total_flops / 1e12, 3),
        "xla_ms": round(total_time["xla"] * 1e3, 2),
        "best_ms": round(total_time["best"] * 1e3, 2),
        "tflops_xla": round(total_flops / total_time["xla"] / 1e12, 1),
        "tflops_best": round(total_flops / total_time["best"] / 1e12, 1),
    }), flush=True)


if __name__ == "__main__":
    import sys as _sys

    if "--bwd" not in _sys.argv:
        main()


def bwd_main():
    """fwd+bwd per conv shape: is the s2d backward (dgrad/wgrad) as
    efficient as its forward? Usage: python tools/mxu_bench.py --bwd"""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args, _ = ap.parse_known_args()

    B = 8
    shapes = [
        ("stem7", 224, 384, 3, 7, 128),
        ("A.mid", 224, 384, 128, 1, 64),
        ("A.7", 224, 384, 64, 7, 16),
        ("A.11", 224, 384, 64, 11, 16),
        ("B.mid", 112, 192, 128, 1, 32),
        ("B.5", 112, 192, 32, 5, 32),
        ("B.7", 112, 192, 32, 7, 32),
        ("BC.7", 112, 192, 64, 7, 32),
        ("BC.11", 112, 192, 64, 11, 32),
    ]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    for tag, H, W, C_in, k, C_out in shapes:
        x = jnp.asarray(rng.standard_normal((B, H, W, C_in)), dt)
        w_np = (rng.standard_normal((k, k, C_in, C_out)) * 0.05).astype(
            np.float32)
        w = jnp.asarray(w_np, dt)
        flops = 3 * 2.0 * B * H * W * k * k * C_in * C_out  # fwd+dgrad+wgrad

        res = {}

        def run(conv_fn, w_in):
            def fb(wv, xv):
                def f(wv, xv):
                    return jnp.sum(conv_fn(wv, xv).astype(jnp.float32))
                gw, gx = jax.grad(f, argnums=(0, 1))(wv, xv)
                return jnp.sum(gw.astype(jnp.float32)) + jnp.sum(
                    gx.astype(jnp.float32))
            return timed(fb, w_in, x, args.iters)

        res["xla"] = run(conv_xla, w)
        if k > 1 and C_out <= 128:
            from consistent_depth_tpu.models import layers as L

            s = L._s2d_factor(H, W, C_in, k, C_out)
            if s:
                def conv_s2d_model(wv, xv, s=s):
                    w2, kk, pad = L.s2d_kernel(wv, s)
                    y = jax.lax.conv_general_dilated(
                        L.space_to_depth(xv, s), w2, (1, 1),
                        [(pad, kk - 1 - pad)] * 2,
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return L.depth_to_space(y, s)
                res[f"s2d{s}"] = run(conv_s2d_model, w)
        print(json.dumps({
            "conv": tag,
            **{m: round(v * 1e6, 1) for m, v in res.items()},
            "tflops": {m: round(flops / v / 1e12, 1)
                       for m, v in res.items()},
        }), flush=True)


if __name__ == "__main__" and "--bwd" in _sys.argv:
    bwd_main()
