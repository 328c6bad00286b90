"""Real-chip validation + benchmark of the Pallas correlation kernel
(flow/correlation.py) at the FlowNetC production shape.

Checks correlation_pallas == correlation (jnp) on the TPU, then times
both with slope timing (constant RPC offset cancelled).

Prints one JSON line per result.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from consistent_depth_tpu.flow.correlation import (
    correlation, correlation_pallas)


def timed(fn, a, b, iters=20):
    """Slope timing: time loops of length n and 3n and divide the
    difference by 2n — cancels the constant per-call RPC cost. (Two
    runs of the SAME loop have zero slope, a bug a previous version of
    this tool had.)"""
    def make_loop(n):
        @jax.jit
        def loop(a, b):
            def body(c, _):
                y = fn(a * (1.0 + 1e-30 * c), b)
                return jnp.mean(y).astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c
        return loop

    lo, hi = make_loop(iters), make_loop(3 * iters)
    np.asarray(jax.device_get(lo(a, b)))
    np.asarray(jax.device_get(hi(a, b)))
    t0 = time.perf_counter()
    np.asarray(jax.device_get(lo(a, b)))
    t1 = time.perf_counter()
    np.asarray(jax.device_get(hi(a, b)))
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / (2 * iters)


def main():
    # FlowNetC conv3 output at the 1024x448 flow feed: (B, 56, 128, 256)
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 56, 128, 256
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.2, jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.2, jnp.float32)

    ref = np.asarray(jax.device_get(correlation(f1, f2)))
    got = np.asarray(jax.device_get(correlation_pallas(f1, f2, block_h=8)))
    err = float(np.max(np.abs(got - ref)))
    print(json.dumps({"check": "pallas_vs_jnp", "max_abs_err": err,
                      "ok": bool(err < 1e-4)}), flush=True)
    assert err < 1e-4

    t_jnp = timed(lambda a, b: correlation(a, b), f1, f2)
    t_pl = timed(lambda a, b: correlation_pallas(a, b, block_h=8), f1, f2)
    # flops: D^2 shifted dot products over C channels
    D = 21
    flops = 2.0 * B * H * W * C * D * D
    print(json.dumps({
        "shape": [B, H, W, C], "D": D,
        "jnp_us": round(t_jnp * 1e6, 1),
        "pallas_us": round(t_pl * 1e6, 1),
        "jnp_tflops": round(flops / t_jnp / 1e12, 1),
        "pallas_tflops": round(flops / t_pl / 1e12, 1),
        "speedup": round(t_jnp / t_pl, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
