"""Is the Adam update leaf-count-bound? Measure the optimizer+guard
tail of the train step both ways on the real chip:

- tree: optax Adam over the 87-leaf hourglass param tree + per-leaf
  finiteness guard + per-leaf masked apply (the production structure)
- flat: the same math over ONE raveled (P,) vector

Slope-timed inside lax.scan (see tools/mxu_bench.py for methodology).
Usage: python tools/opt_bench.py
"""

import json
import os as _os
import sys as _sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def slope_timed(make_loop, iters=32):
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
    from consistent_depth_tpu.models.mannequin_challenge import (
        MannequinChallengeModel,
    )
    from consistent_depth_tpu.training import create_optimizer

    model = MannequinChallengeModel(checkpoint="", seed=0)
    params = model.variables["params"]
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(json.dumps({"leaves": n_leaves, "params": int(n_params)}))

    tx = create_optimizer("Adam", 4e-4)
    flat, unravel = jax.flatten_util.ravel_pytree(params)

    def step_tree(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        ok = jax.tree_util.tree_reduce(
            jnp.logical_and,
            jax.tree_util.tree_map(
                lambda g: jnp.all(jnp.isfinite(g)), grads),
            jnp.asarray(True))
        params = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new_params, params)
        return params, opt_state

    def run_tree(iters):
        opt_state0 = tx.init(params)

        @jax.jit
        def loop(params, opt_state):
            def body(carry, _):
                p, s = carry
                grads = jax.tree_util.tree_map(
                    lambda t: t * 1e-8, p)   # dependence, no blowup
                return step_tree(p, s, grads), None
            (p, s), _ = jax.lax.scan(
                body, (params, opt_state), None, length=iters)
            return jax.tree_util.tree_leaves(p)[0].sum()
        return lambda: loop(params, opt_state0)

    def run_flat(iters):
        opt_state0 = tx.init(flat)

        @jax.jit
        def loop(fp, opt_state):
            def body(carry, _):
                p, s = carry
                grads = p * 1e-8
                updates, s = tx.update(grads, s, p)
                new_p = optax.apply_updates(p, updates)
                ok = jnp.all(jnp.isfinite(grads))
                return (jnp.where(ok, new_p, p), s), None
            (p, s), _ = jax.lax.scan(
                body, (flat, opt_state), None, length=iters)
            return p.sum()
        return lambda: loop(flat, opt_state0)

    for name, runner in (("tree", run_tree), ("flat", run_flat)):
        ms = slope_timed(runner) * 1e3
        print(json.dumps({"variant": name, "ms_per_step": round(ms, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
