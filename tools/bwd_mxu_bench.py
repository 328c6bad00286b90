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
    value fetch is the only honest barrier here (see bench.py)."""
    lo, hi = make_loop(iters), make_loop(3 * iters)
    np.asarray(jax.device_get(lo()))
    np.asarray(jax.device_get(hi()))
    t0 = time.perf_counter()
    np.asarray(jax.device_get(lo()))
    t1 = time.perf_counter()
    np.asarray(jax.device_get(hi()))
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / (2 * iters)


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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from consistent_depth_tpu.models import layers

    layers.set_compute_dtype(jnp.bfloat16)

    shapes = [s for s in SHAPES if not args.quick or s[0] in QUICK]
    B = 8
    rng = np.random.default_rng(0)
    rows = []
    tot = {"gx_native": 0.0, "gx_s2d": 0.0, "gw_native": 0.0,
           "gw_s2d": 0.0, "flops": 0.0}
    for tag, H, W, C_in, k, C_out, count in shapes:
        x = jnp.asarray(rng.standard_normal((B, H, W, C_in)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((k, k, C_in, C_out)) * 0.05, jnp.float32)
        pad = (k - 1) // 2
        flops = 2.0 * B * H * W * k * k * C_in * C_out  # per direction

        def run_variant(s2d_on, argnum):
            # grad wrt x (argnum=1) or w (argnum=0) of sum(conv): the
            # forward conv output is unused by the pullback (cotangent
            # of sum is ones), so XLA DCEs it and the measured program
            # is the single backward conv class + any s2d transforms —
            # the true incremental cost of that class in the train step.
            def f(w_, x_):
                layers.set_s2d_enabled(s2d_on)  # trace-time choice
                return conv_sum(w_, x_)

            def conv_sum(w_, x_):
                return layers.conv_compute(
                    w_, None, x_, stride=1, padding=pad).astype(
                        jnp.float32).sum()

            g = jax.grad(f, argnums=argnum)

            def make_loop(n):
                @jax.jit
                def loop(w_, x_):
                    def body(c, _):
                        out = g(w_ * (1 + 1e-30 * c), x_)
                        return jnp.mean(out).astype(jnp.float32), None
                    c, _ = lax.scan(body, jnp.float32(0), None, length=n)
                    return c
                return lambda: loop(w, x)
            return slope_timed(make_loop, args.iters)

        # does the production policy pick s2d for this class?
        s_used = layers._s2d_factor(H, W, C_in, k, C_out)
        row = {"tag": tag, "H": H, "W": W, "C_in": C_in, "k": k,
               "C_out": C_out, "count": count, "policy_s2d": s_used}
        for name, (s2d_on, argnum) in {
            "gx_native": (False, 1), "gw_native": (False, 0),
            "gx_s2d": (True, 1), "gw_s2d": (True, 0),
        }.items():
            if s2d_on and not s_used:
                row[name] = row[name.replace("_s2d", "_native")]
            else:
                row[name] = run_variant(s2d_on, argnum)
            row[name + "_tflops"] = round(flops / row[name] / 1e12, 1)
        for d in ("gx", "gw"):
            tot[f"{d}_native"] += count * row[f"{d}_native"]
            tot[f"{d}_s2d"] += count * row[f"{d}_s2d"]
        tot["flops"] += count * flops
        row = {k_: (round(v * 1e3, 3) if isinstance(v, float) else v)
               for k_, v in row.items()}
        print(json.dumps(row), flush=True)
        rows.append(row)

    summary = {
        "net_backward_ms": {
            "native": round(1e3 * (tot["gx_native"] + tot["gw_native"]), 1),
            "production_s2d": round(
                1e3 * (tot["gx_s2d"] + tot["gw_s2d"]), 1),
        },
        "gx_ms": {"native": round(1e3 * tot["gx_native"], 1),
                  "s2d": round(1e3 * tot["gx_s2d"], 1)},
        "gw_ms": {"native": round(1e3 * tot["gw_native"], 1),
                  "s2d": round(1e3 * tot["gw_s2d"], 1)},
        "honest_tflop_per_direction": round(tot["flops"] / 1e12, 3),
        # classes where the production inheritance is WRONG (other
        # formulation measurably faster): candidates for a
        # backward-specific policy gate
        "override_candidates": [
            {"tag": r["tag"], "dir": d,
             "s2d_ms": r[f"{d}_s2d"], "native_ms": r[f"{d}_native"]}
            for r in rows for d in ("gx", "gw")
            if min(r[f"{d}_s2d"], r[f"{d}_native"])
            < 0.8 * (r[f"{d}_s2d"] if r["policy_s2d"]
                     else r[f"{d}_native"])
            and abs(r[f"{d}_s2d"] - r[f"{d}_native"]) > 0.15
        ],
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
