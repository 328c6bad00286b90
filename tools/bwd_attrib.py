"""Attribute the hourglass fwd+bwd time to subsystems by measuring
variants on the real chip: BN train vs eval mode (isolates batch-stat
reductions + running-stat updates), s2d on vs off, and forward-only for
each. Slope-timed (see tools/mxu_bench.py for the methodology — the
axon RPC constant swamps anything else).

Usage: python tools/bwd_attrib.py
"""

import json
import os as _os
import sys as _sys
import time

import numpy as np

import jax
import jax.numpy as jnp

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


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


def main():
    from consistent_depth_tpu.utils.jit_cache import (
        enable_persistent_jit_cache,
    )

    enable_persistent_jit_cache()
    from consistent_depth_tpu.models import layers
    from consistent_depth_tpu.models.mannequin_challenge import (
        MannequinChallengeModel,
    )

    layers.set_compute_dtype(jnp.bfloat16)

    H, W, B = 224, 384, 4
    model = MannequinChallengeModel(checkpoint="", seed=0)
    params = model.variables["params"]
    batch_stats = model.variables.get("batch_stats", {})

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, 2, H, W, 3)), jnp.float32)

    def chain(fn, iters):
        @jax.jit
        def loop():
            def body(c, _):
                scale = (1.0 + 1e-30 * c)
                p = jax.tree_util.tree_map(
                    lambda t: (t * scale).astype(t.dtype), params)
                return jnp.asarray(fn(p), jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c
        return loop

    def fwd(p, train):
        v = {"params": p}
        if batch_stats:
            v["batch_stats"] = batch_stats
        out, _ = model.apply(v, images, train=train)
        return jnp.mean(out)

    def fwd_bwd(p, train):
        g = jax.grad(lambda q: fwd(q, train))(p)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    def report(name, sec):
        print(json.dumps({"part": name, "ms": round(sec * 1e3, 2)}),
              flush=True)

    for s2d in (True, False):
        layers.set_s2d_enabled(s2d)
        tag = "s2d" if s2d else "native"
        report(f"fwd_train_{tag}",
               slope_timed(lambda n: chain(lambda p: fwd(p, True), n)))
        report(f"fwd_eval_{tag}",
               slope_timed(lambda n: chain(lambda p: fwd(p, False), n)))
        report(f"fwdbwd_train_{tag}",
               slope_timed(lambda n: chain(lambda p: fwd_bwd(p, True), n)))
        report(f"fwdbwd_eval_{tag}",
               slope_timed(lambda n: chain(lambda p: fwd_bwd(p, False), n)))
    layers.set_s2d_enabled(True)


if __name__ == "__main__":
    main()
