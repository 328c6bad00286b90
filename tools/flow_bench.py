"""FlowNet2 forward throughput on the real chip (the flow-stage cost of
the end-to-end pipeline; reference runs FlowNet2 per directed pair —
optical_flow_flownet2_homography.py:246-252). Slope-timed like
tools/mxu_bench.py.

Usage: python tools/flow_bench.py [--full] [--size 448 768]
"""

import argparse
import json
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def slope_timed(make_loop, iters=4):
    lo, hi = make_loop(iters), make_loop(3 * iters)
    np.asarray(jax.device_get(lo()))
    np.asarray(jax.device_get(hi()))
    t0 = time.perf_counter()
    np.asarray(jax.device_get(lo()))
    t1 = time.perf_counter()
    np.asarray(jax.device_get(hi()))
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / (2 * iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=(448, 768),
                    help="FlowNet2 input H W (must be /64)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()

    from consistent_depth_tpu.flow.flownet import FlowNet2, FlowNet2CSS
    from consistent_depth_tpu.models import layers

    layers.set_compute_dtype(
        jnp.bfloat16 if args.dtype == "bf16" else None)

    H, W = args.size
    B = args.batch
    rng = np.random.default_rng(0)
    im1 = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    im2 = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)

    for name, cls in (("css", FlowNet2CSS), ("full", FlowNet2)):
        mod = cls()
        variables = mod.init(jax.random.PRNGKey(0), im1, im2)

        def fwd(v):
            return jnp.mean(mod.apply(v, im1, im2))

        def chain(iters):
            # weights ride as arguments, NOT closure constants — baked-in
            # literals of this size exceed the tunnel's compile-request
            # body limit (HTTP 413)
            @jax.jit
            def loop(variables):
                def body(c, _):
                    v = jax.tree_util.tree_map(
                        lambda t: (t * (1.0 + 1e-30 * c)).astype(t.dtype),
                        variables)
                    return jnp.asarray(fwd(v), jnp.float32), None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
                return c
            return lambda: loop(variables)

        sec = slope_timed(chain)
        print(json.dumps({
            "net": name, "batch": B, "size": [H, W],
            "ms_per_pair": round(sec * 1e3 / B, 2),
            "pairs_per_s": round(B / sec, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
