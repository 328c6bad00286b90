"""Bound the non-conv parts of the hourglass fwd+bwd by ablation.

PERF.md's decomposition leaves ~34 ms of the 92.8 ms fwd+bwd
unattributed to conv compute (conv floor ~19.6 fwd + ~39 bwd). This
tool measures the full fwd+bwd with individual graph subsystems
replaced by cheaper stand-ins (WRONG numerics — measurement only), so
each ablation bounds that subsystem's cost from above:

  baseline        the production graph (should match tail_bench fwd_bwd)
  no_upsample     upsample_bilinear_2x -> nearest repeat (kills the
                  dense H/W interpolation einsums + their transposes)
  no_bn           all BatchNorm -> identity (kills every stat reduction,
                  normalize pass, and their backward reductions)
  no_s2d          s2d conv path off (native convs; NOT an overhead bound
                  — the convs themselves get slower — but pins the
                  net s2d win at HEAD)
  eval_bn         train=False BN (running stats; no batch reductions,
                  no stat-grad chain — isolates train-BN's marginal cost
                  while keeping the normalize pass)

Usage: python tools/graph_attrib.py
"""

import json
import os as _os
import sys as _sys
import time
from contextlib import contextmanager

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


@contextmanager
def patched(mod, name, repl):
    orig = getattr(mod, name)
    setattr(mod, name, repl)
    try:
        yield
    finally:
        setattr(mod, name, orig)


def main():
    from consistent_depth_tpu.utils.jit_cache import (
        enable_persistent_jit_cache,
    )

    enable_persistent_jit_cache()
    from consistent_depth_tpu.models import hourglass, layers
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

    def fwd(p, train=True):
        v = {"params": p}
        if batch_stats:
            v["batch_stats"] = batch_stats
        out, _ = model.apply(v, images, train=train)
        return jnp.mean(out)

    def fwd_bwd(p, train=True):
        g = jax.grad(lambda q: fwd(q, train))(p)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    def report(name, sec):
        print(json.dumps({"ablation": name, "ms": round(sec * 1e3, 2)}),
              flush=True)

    report("baseline", slope_timed(lambda n: chain(fwd_bwd, n)))

    # upsample -> nearest repeat (no interpolation einsums)
    with patched(layers, "upsample_bilinear_2x", layers.upsample_nearest_2x), \
         patched(hourglass, "upsample_bilinear_2x",
                 layers.upsample_nearest_2x):
        report("no_upsample", slope_timed(lambda n: chain(fwd_bwd, n)))

    # all BN -> identity (both the module and the fused function)
    def _id_bn(x, stats, train, initializing, momentum=0.1, eps=1e-5):
        return x

    class _IdBN:
        def __init__(self, *a, **k):
            self._name = k.get("name")

        def __call__(self, x, train=True):
            return x

    with patched(layers, "fused_batch_norm", _id_bn):
        # TorchBatchNorm is only used by the stem (seq_1); patch its
        # __call__ via a subclass swap in the hourglass module namespace
        with patched(hourglass, "TorchBatchNorm", _IdBN):
            report("no_bn", slope_timed(lambda n: chain(fwd_bwd, n)))

    # eval-mode BN (running stats, no batch reductions)
    report("eval_bn", slope_timed(
        lambda n: chain(lambda p: fwd_bwd(p, False), n)))

    # s2d off (net effect of the s2d policy at HEAD)
    layers.set_s2d_enabled(False)
    try:
        report("no_s2d", slope_timed(lambda n: chain(fwd_bwd, n)))
    finally:
        layers.set_s2d_enabled(True)

    # fused Pallas s2d convs in-net (round 5): forward + inherited
    # grad-input through the VMEM-staged kernel, grad-weight unchanged.
    # Known-rejected by Mosaic on the real chip (PERF.md "Fused Pallas
    # s2d conv") — report the compile error as the row instead of
    # crashing the whole attribution run; on CPU the kernel is never
    # eligible, so the row would silently re-measure the baseline —
    # skip it there.
    if jax.devices()[0].platform == "cpu":
        print("pallas_s2d: skipped (kernel ineligible on CPU — the "
              "row would just re-time the baseline)")
    else:
        layers.set_pallas_s2d(True)
        try:
            report("pallas_s2d", slope_timed(lambda n: chain(fwd_bwd, n)))
        except Exception as e:  # Mosaic rejection, expected on TPU
            print(f"pallas_s2d: COMPILE FAILED ({str(e)[:160]})")
        finally:
            layers.set_pallas_s2d(False)


if __name__ == "__main__":
    main()
