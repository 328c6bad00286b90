"""Per-conv-class BACKWARD microbenchmark (round-3 VERDICT weak #1 /
next-round #4): the forward got a per-shape measured policy
(tools/mxu_bench.py -> models/layers.py::_s2d_factor); the backward —
~52% of the train step — was only ever measured in aggregate
(tools/bwd_attrib.py). This tool measures the two backward conv classes
for every unique hourglass conv shape, under both formulations the
production path can take:

  gx  grad-input  (cotangent conv flipped kernel; contraction depth =
      C_out per tap — SHALLOW for the inception branches' C_out 16/32)
  gw  grad-weight (input x cotangent contraction over B*H*W; MXU lanes
      = C_out — the same lane bound as the forward)

Variants per class:
  native  jax.grad through the plain XLA conv
  s2d     jax.grad through the production space-to-depth path
          (models/layers.py::conv_compute with the measured policy,
          including the kernel-transform VJP's scatter back to the
          compact layout — the honest production cost)

The production backward inherits the forward's s2d choice (autodiff of
conv_compute), so this bench both validates that inheritance per class
and quantifies what a per-class OVERRIDE could save: if some class
measured faster under the other formulation, the policy would need a
backward-specific gate. Reference hot loop being attributed:
depth_fine_tuning.py:261-304 (loss.backward()).

Usage: python tools/bwd_mxu_bench.py [--iters 8] [--quick]
Prints one JSON line per (class, direction, variant) + a summary table.
"""

import argparse
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def slope_timed(make_loop, iters):
    """Steady-state s/iter: slope between an iters- and a 3*iters-loop
    cancels the per-call RPC constant (~25-30 ms on the tunneled chip);
    value fetch is the only honest barrier here (see bench.py). The
    tunnel jitters by several ms per call, so iters must be large
    enough that 2*iters executions of the class clear that (the
    micro-classes here are tens of µs — hundreds of iterations), and
    the slope is taken as the median of 3 timed pairs (compiles are
    the expensive part; re-running the two programs is cheap)."""
    lo, hi = make_loop(iters), make_loop(3 * iters)
    np.asarray(jax.device_get(lo()))
    np.asarray(jax.device_get(hi()))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(lo()))
        t1 = time.perf_counter()
        np.asarray(jax.device_get(hi()))
        t2 = time.perf_counter()
        slopes.append(max((t2 - t1) - (t1 - t0), 1e-9) / (2 * iters))
    return sorted(slopes)[1]


# every unique conv shape in HourglassModel at the demo feed 224x384
# (same table as tools/mxu_bench.py), batch 8 images (4 pairs)
SHAPES = [
    ("stem7", 224, 384, 3, 7, 128, 1),
    ("A.1x1", 224, 384, 128, 1, 16, 1),
    ("A.mid", 224, 384, 128, 1, 64, 3),
    ("A.3", 224, 384, 64, 3, 16, 1),
    ("A.7", 224, 384, 64, 7, 16, 1),
    ("A.11", 224, 384, 64, 11, 16, 1),
    ("B.1x1", 112, 192, 128, 1, 32, 4),
    ("B.mid", 112, 192, 128, 1, 32, 12),
    ("B.3", 112, 192, 32, 3, 32, 4),
    ("B.5", 112, 192, 32, 5, 32, 4),
    ("B.7", 112, 192, 32, 7, 32, 4),
    ("BC.1x1", 112, 192, 256, 1, 32, 2),
    ("BC.mid", 112, 192, 256, 1, 64, 6),
    ("BC.3", 112, 192, 64, 3, 32, 2),
    ("BC.7", 112, 192, 64, 7, 32, 2),
    ("BC.11", 112, 192, 64, 11, 32, 1),
    ("BB.5", 112, 192, 64, 5, 32, 1),
    ("D.1x1", 56, 96, 128, 1, 64, 1),
    ("D.mid", 56, 96, 128, 1, 32, 3),
    ("D.3", 56, 96, 32, 3, 64, 1),
    ("D.5", 56, 96, 32, 5, 64, 1),
    ("D.7", 56, 96, 32, 7, 64, 1),
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
    ("F.3", 28, 48, 64, 3, 64, 1),
    ("F.7", 28, 48, 64, 7, 64, 1),
    ("F.11", 28, 48, 64, 11, 64, 1),
    ("G.3", 56, 96, 32, 3, 32, 1),
    ("G.5", 56, 96, 32, 5, 32, 1),
    ("G.7", 56, 96, 32, 7, 32, 1),
    ("pred3", 224, 384, 64, 3, 1, 2),
]

QUICK = ("stem7", "A.11", "A.7", "A.3", "B.7", "BC.11", "E56.7", "F.11",
         "A.mid", "BC.mid", "pred3")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=192)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from consistent_depth_tpu.utils.jit_cache import (
        enable_persistent_jit_cache,
    )

    enable_persistent_jit_cache()
    from consistent_depth_tpu.models import layers

    layers.set_compute_dtype(jnp.bfloat16)

    shapes = [s for s in SHAPES if not args.quick or s[0] in QUICK]
    B = 8
    rng = np.random.default_rng(0)
    rows = []
    overhead_cache = {}
    tot = {"gx_native": 0.0, "gx_s2d": 0.0, "gw_native": 0.0,
           "gw_s2d": 0.0, "gx_prod": 0.0, "gw_prod": 0.0,
           "gx_best": 0.0, "gw_best": 0.0, "flops": 0.0}
    for tag, H, W, C_in, k, C_out, count in shapes:
        x = jnp.asarray(rng.standard_normal((B, H, W, C_in)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((k, k, C_in, C_out)) * 0.05, jnp.float32)
        pad = (k - 1) // 2
        flops = 2.0 * B * H * W * k * k * C_in * C_out  # per direction

        def conv_fn(w_, x_):
            return layers.conv_compute(w_, None, x_, stride=1, padding=pad)

        def run_variant(s2d_on, wrt):
            # Time ONE backward conv class via an explicit VJP pullback.
            # Something in the body must vary per scan iteration or XLA
            # hoists the whole pullback out of the loop (grad-weight
            # does not even read w, so varying w — the forward bench's
            # trick — measures an empty loop). grad-input (gx) varies
            # the KERNEL (tiny, zero overhead; the transposed conv
            # reads it). grad-weight (gw) contracts two big tensors
            # (input x cotangent) and nothing small participates, so
            # the cotangent is scaled per iteration; that scale's own
            # cost is measured separately below (ct_overhead) — it is
            # identical across variants, so the s2d-vs-native
            # comparison is unbiased, and gw_ms minus the overhead
            # bounds the true class cost from below. The forward conv
            # primal is unused by the pullback and DCEs away.
            layers.set_s2d_enabled(s2d_on)  # trace-time choice
            try:
                out = jax.eval_shape(conv_fn, w, x)
                ct0 = jnp.ones(out.shape, out.dtype)

                def make_loop(n):
                    @jax.jit
                    def loop(w0, x0, ct_):
                        def body(c, _):
                            if wrt == "x":
                                wv = w0 * (1 + 1e-30 * c)
                                _, pull = jax.vjp(
                                    lambda x_: conv_fn(wv, x_), x0)
                                (d,) = pull(ct_)
                            else:
                                _, pull = jax.vjp(
                                    lambda w_: conv_fn(w_, x0), w0)
                                (d,) = pull((ct_ * (1 + 1e-30 * c))
                                            .astype(ct_.dtype))
                            return jnp.mean(d).astype(jnp.float32), None
                        r, _ = lax.scan(
                            body, jnp.float32(0), None, length=n)
                        return r
                    return lambda: loop(w, x, ct0)
                return slope_timed(make_loop, args.iters)
            finally:
                layers.set_s2d_enabled(True)

        def run_gx_repolicied():
            # grad-input expressed as its OWN stride-1 same-padding
            # conv — cotangent convolved with the flipped kernel
            # transposed to (k, k, C_out, C_in) — so the s2d policy
            # evaluates it at its own geometry (lanes = C_in,
            # contraction depth = C_out) instead of inheriting the
            # forward's choice through autodiff. This is the candidate
            # custom-VJP formulation.
            out = jax.eval_shape(conv_fn, w, x)
            ct0 = jnp.ones(out.shape, out.dtype)
            wf = w[::-1, ::-1].transpose(0, 1, 3, 2)

            def make_loop(n):
                @jax.jit
                def loop(wf_, ct_):
                    def body(c, _):
                        wv = wf_ * (1 + 1e-30 * c)
                        d = layers.conv_compute(
                            wv, None, ct_, stride=1, padding=pad)
                        return jnp.mean(d).astype(jnp.float32), None
                    r, _ = lax.scan(body, jnp.float32(0), None, length=n)
                    return r
                return lambda: loop(wf, ct0)
            return slope_timed(make_loop, args.iters)

        def ct_overhead():
            # the gw varier's own cost: scale + reduce of the cotangent
            out = jax.eval_shape(conv_fn, w, x)
            ct0 = jnp.ones(out.shape, out.dtype)

            def make_loop(n):
                @jax.jit
                def loop(ct_):
                    def body(c, _):
                        d = ct_ * (1 + 1e-30 * c)
                        return jnp.mean(d).astype(jnp.float32), None
                    r, _ = lax.scan(body, jnp.float32(0), None, length=n)
                    return r
                return lambda: loop(ct0)
            return slope_timed(make_loop, args.iters)

        # does the production policy pick s2d for this class?
        s_used = layers._s2d_factor(H, W, C_in, k, C_out)
        row = {"tag": tag, "H": H, "W": W, "C_in": C_in, "k": k,
               "C_out": C_out, "count": count, "policy_s2d": s_used}
        okey = (H, W, C_out)
        if okey not in overhead_cache:
            overhead_cache[okey] = ct_overhead()
        row["gw_overhead"] = overhead_cache[okey]
        for name, (s2d_on, wrt) in {
            "gx_native": (False, "x"), "gw_native": (False, "w"),
            "gx_s2d": (True, "x"), "gw_s2d": (True, "w"),
        }.items():
            if s2d_on and not s_used:
                row[name] = row[name.replace("_s2d", "_native")]
            else:
                row[name] = run_variant(s2d_on, wrt)
            row[name + "_tflops"] = round(flops / row[name] / 1e12, 1)
        rs = layers._s2d_factor(H, W, C_out, k, C_in)
        if rs == 0 and not s_used:
            # repol with factor 0 == the native flipped-kernel conv,
            # which is what autodiff of the native forward already
            # lowers to — reuse the gx_native measurement
            row["gx_repol"] = row["gx_native"]
        else:
            row["gx_repol"] = run_gx_repolicied()
        row["gx_repol_tflops"] = round(flops / row["gx_repol"] / 1e12, 1)
        row["gx_repol_s2d"] = rs
        for d in ("gx", "gw"):
            over = row["gw_overhead"] if d == "gw" else 0.0
            tot[f"{d}_native"] += count * max(row[f"{d}_native"] - over, 0)
            tot[f"{d}_s2d"] += count * max(row[f"{d}_s2d"] - over, 0)
        prod_gx = row["gx_s2d"] if row["policy_s2d"] else row["gx_native"]
        prod_gw = (row["gw_s2d"] if row["policy_s2d"]
                   else row["gw_native"]) - row["gw_overhead"]
        tot["gx_best"] += count * min(
            row["gx_native"], row["gx_s2d"], row["gx_repol"])
        tot["gw_best"] += count * max(
            min(row["gw_native"], row["gw_s2d"]) - row["gw_overhead"], 0)
        tot["gx_prod"] += count * prod_gx
        tot["gw_prod"] += count * max(prod_gw, 0)
        tot["flops"] += count * flops
        row = {k_: (round(v * 1e3, 3)
                    if isinstance(v, float) and not k_.endswith("_tflops")
                    else v)
               for k_, v in row.items()}
        print(json.dumps(row), flush=True)
        rows.append(row)

    summary = {
        # gw terms are ct-varier-overhead-corrected (lower bounds)
        "net_backward_ms": {
            "native": round(1e3 * (tot["gx_native"] + tot["gw_native"]), 1),
            "production_s2d": round(
                1e3 * (tot["gx_s2d"] + tot["gw_s2d"]), 1),
            "production_policy": round(
                1e3 * (tot["gx_prod"] + tot["gw_prod"]), 1),
            "best_per_class": round(
                1e3 * (tot["gx_best"] + tot["gw_best"]), 1),
        },
        "gx_ms": {"native": round(1e3 * tot["gx_native"], 1),
                  "s2d": round(1e3 * tot["gx_s2d"], 1),
                  "prod": round(1e3 * tot["gx_prod"], 1),
                  "best": round(1e3 * tot["gx_best"], 1)},
        "gw_ms": {"native": round(1e3 * tot["gw_native"], 1),
                  "s2d": round(1e3 * tot["gw_s2d"], 1),
                  "prod": round(1e3 * tot["gw_prod"], 1),
                  "best": round(1e3 * tot["gw_best"], 1)},
        "honest_tflop_per_direction": round(tot["flops"] / 1e12, 3),
        # classes where the production inheritance is WRONG (another
        # formulation measurably faster): candidates for a
        # backward-specific policy gate. gx considers the re-policied
        # flipped-kernel conv too; gw compares native vs inherited s2d.
        "override_candidates": [
            {"tag": r["tag"], "dir": d, "count": r["count"],
             "prod_ms": prod, "best_ms": best,
             "best_variant": variant,
             "save_ms_total": round(r["count"] * (prod - best), 3)}
            for r in rows for d in ("gx", "gw")
            for prod in [r[f"{d}_s2d"] if r["policy_s2d"]
                         else r[f"{d}_native"]]
            for best, variant in [min(
                [(r[f"{d}_native"], f"{d}_native"),
                 (r[f"{d}_s2d"], f"{d}_s2d")]
                + ([(r["gx_repol"], "gx_repol")] if d == "gx" else []))]
            if best < 0.85 * prod and prod - best > 0.05
        ],
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
