"""Quantify the layout cost of the space-to-depth conv path per conv
class, ON CHIP — the round-4 attribution left ~17.6 ms/step of
"layout/transpose/fusion slack tied to the s2d path" in the model
fwd+bwd (PERF.md graph-subsystem ablation), and this tool decides
whether a fused Pallas s2d-conv (gather in VMEM staging, no
materialized expanded layout) can attack it.

For every s2d-eligible hourglass conv class (same enumeration as
tools/mxu_bench.py) it times, forward and fwd+bwd:

  full    s2d(x) -> conv -> d2s          (the production formulation)
  core    conv only, on pre-transformed x2 -> y2 (no layout ops)
  layout  s2d(x) -> d2s(identity-ish round trip) alone

``full - core`` bounds what a fused kernel could save per isolated
conv; if it is ~0, XLA already fuses the transposes into the conv's
operand/output fusions and the in-net slack lives at FUSION BOUNDARIES
between ops (BN/concat/relu between convs), which a per-conv kernel
cannot fix — that outcome is the "measured negative + HLO decomposition"
branch of VERDICT item 2.

Usage: python tools/s2d_layout_bench.py [--iters 8] [--classes all]
Prints one JSON line per class.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def slope_timed(make_loop, iters=8):
    lo, hi = make_loop(iters), make_loop(3 * iters)
    np.asarray(jax.device_get(lo()))
    np.asarray(jax.device_get(hi()))
    t0 = time.perf_counter()
    np.asarray(jax.device_get(lo()))
    t1 = time.perf_counter()
    np.asarray(jax.device_get(hi()))
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / (2 * iters)


# (name, H, W, C_in, k, C_out) — the s2d-active hourglass classes with
# their instance counts in one forward (B = 8 images: 4 pairs x 2)
CLASSES = [
    ("stem7", 224, 384, 3, 7, 128, 1),
    ("A.7", 224, 384, 64, 7, 16, 1),
    ("A.11", 224, 384, 64, 11, 16, 1),
    ("B.5", 112, 192, 32, 5, 32, 3),
    ("B.7", 112, 192, 32, 7, 32, 3),
    ("BC.7", 112, 192, 64, 7, 32, 1),
    ("BC.11", 112, 192, 64, 11, 32, 1),
    ("BB.5", 112, 192, 64, 5, 32, 1),
    ("BB.7", 112, 192, 64, 7, 32, 1),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    from consistent_depth_tpu.utils.jit_cache import (
        enable_persistent_jit_cache,
    )

    enable_persistent_jit_cache()
    from consistent_depth_tpu.models import layers as L

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    results = []
    for name, H, W, C_in, k, C_out, count in CLASSES:
        s = L._s2d_factor(H, W, C_in, k, C_out)
        if not s:
            continue
        p = (k - 1) // 2
        x = jnp.asarray(rng.standard_normal(
            (args.batch, H, W, C_in)), dt)
        w = jnp.asarray(rng.standard_normal(
            (k, k, C_in, C_out)) * 0.05, dt)
        w2_const, kk, pad = L.s2d_kernel(w, s)
        x2_const = L.space_to_depth(x, s)

        def full(w_, x_):
            w2, kk_, pad_ = L.s2d_kernel(w_, s)
            y = jax.lax.conv_general_dilated(
                L.space_to_depth(x_, s), w2, (1, 1),
                [(pad_, kk_ - 1 - pad_)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return L.depth_to_space(y, s)

        def core(w2_, x2_):
            return jax.lax.conv_general_dilated(
                x2_, w2_, (1, 1), [(pad, kk - 1 - pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def layout(x_):
            # the round trip alone (both transposes, no conv); +1e-6
            # blocks XLA from cancelling s2d(d2s)
            return L.depth_to_space(L.space_to_depth(x_, s) + 1e-2, s)

        def loop_of(fn, *operands):
            def make(iters):
                @jax.jit
                def run():
                    def body(c, _):
                        outs = fn(*[o + c.astype(o.dtype) * 1e-30
                                    for o in operands])
                        return jnp.asarray(
                            jnp.mean(outs), jnp.float32), None
                    c, _ = jax.lax.scan(
                        body, jnp.float32(0), None, length=iters)
                    return c
                return run
            return make

        def grad_of(fn, *operands):
            def g(*ops):
                return jax.grad(
                    lambda *o: jnp.mean(fn(*o)).astype(jnp.float32),
                    argnums=tuple(range(len(ops))))(*ops)

            def fn_sum(*ops):
                gs = g(*ops)
                return sum(jnp.mean(t).astype(jnp.float32) for t in gs)
            return loop_of(fn_sum, *operands)

        # the fused Pallas kernel (VMEM-staged s2d, no HBM layout round
        # trip) — co_split keeps the weight block under VMEM limits
        from consistent_depth_tpu.ops.s2d_conv import s2d_conv_pallas

        # same VMEM-budget split the integrated path uses — reuse the
        # production helper so a budget change reaches this bench
        co_split = L._pallas_co_split(
            k, s, C_in, C_out, x.dtype.itemsize)

        def pallas_fn(w_, x_, co_split=co_split):
            return s2d_conv_pallas(x_, w_, s=s, block_h=8,
                                   co_split=co_split)

        row = {"class": name, "s": s, "kk": kk, "count": count,
               "co_split": co_split, "fwd_ms": {}, "fwdbwd_ms": {}}
        variants = [
            ("full", full, (w, x)),
            ("core", core, (w2_const, x2_const)),
            ("layout", layout, (x,)),
            ("pallas", pallas_fn, (w, x)),
        ]
        for label, fn, ops in variants:
            try:
                row["fwd_ms"][label] = round(
                    1e3 * slope_timed(loop_of(fn, *ops), args.iters), 3)
            except Exception as e:
                # the pallas variant is Mosaic-rejected on the real
                # chip (PERF.md "Fused Pallas s2d conv"); record the
                # rejection instead of aborting the layout measurements
                # this tool exists to produce
                row["fwd_ms"][label] = f"COMPILE FAILED: {str(e)[:120]}"
                continue
            if not args.fwd_only and label != "pallas":
                # (pallas_call has no autodiff rule; its backward is
                # composed explicitly — gx timed below, gw stays XLA)
                row["fwdbwd_ms"][label] = round(
                    1e3 * slope_timed(grad_of(fn, *ops), args.iters), 3)

        # grad-input through the fused kernel: its own conv of the
        # cotangent with the flipped/channel-swapped kernel (exactly
        # what _conv_override_bwd does for gx_s >= 0)
        ct = jnp.asarray(
            rng.standard_normal((args.batch, H, W, C_out)), dt)
        wf = w[::-1, ::-1].transpose(0, 1, 3, 2)
        gx_split = L._pallas_co_split(
            k, s, C_out, C_in, x.dtype.itemsize)

        def pallas_gx(w_, c_, gx_split=gx_split):
            return s2d_conv_pallas(c_, w_, s=s, block_h=8,
                                   co_split=gx_split)

        try:
            row["pallas_gx_ms"] = round(
                1e3 * slope_timed(loop_of(pallas_gx, wf, ct),
                                  args.iters), 3)
        except Exception as e:
            row["pallas_gx_ms"] = f"COMPILE FAILED: {str(e)[:120]}"
        row["fwd_layout_overhead_ms"] = round(
            row["fwd_ms"]["full"] - row["fwd_ms"]["core"], 3)
        if not args.fwd_only:
            row["fwdbwd_layout_overhead_ms"] = round(
                row["fwdbwd_ms"]["full"] - row["fwdbwd_ms"]["core"], 3)
        print(json.dumps(row), flush=True)
        results.append(row)

    tot_fwd = sum(r["fwd_layout_overhead_ms"] * r["count"] for r in results)
    summary = {"sum_fwd_layout_overhead_ms": round(tot_fwd, 2)}
    if not args.fwd_only:
        summary["sum_fwdbwd_layout_overhead_ms"] = round(
            sum(r["fwdbwd_layout_overhead_ms"] * r["count"]
                for r in results), 2)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
