"""Isolate the train step's non-conv tail on the real chip.

The step decomposition (PERF.md) leaves ~5.6 ms attributed to
"optimizer + NaN-guard + misc". Hypothesis: the tail is dominated by
kernel-launch overhead of the ravel/unravel slice chains — the finite
guard ravels ~350 gradient leaves, optax.flatten ravels them AGAIN,
unravels the updates, and the masked apply touches every leaf: ~1400
small fusions per step. Variants measured (224x384, bs 4, bf16,
slope-timed over scan programs like tools/mxu_bench.py):

  fwd_bwd        value_and_grad only (no optimizer, no guard)
  adam_noguard   + optax.flatten Adam apply, no finite guard
  full           the production step (guard + masked apply)
  flat_state     single-ravel redesign: params/opt state live FLAT in
                 the train state, unravel happens inside the loss fwd,
                 Adam + guard + apply all run on the flat vector
  resize_default full step with RESIZE_PRECISION="default" instead of
                 "highest" (bf16 interpolation matmuls in the decoder)

Usage: python tools/tail_bench.py
"""

import json
import os as _os
import sys as _sys
import time

import numpy as np

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

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
    from consistent_depth_tpu.ops import resample
    from consistent_depth_tpu.ops.losses import LossWeights, joint_loss

    layers.set_compute_dtype(jnp.bfloat16)
    resample.set_splat_enabled(True)

    H, W, B = 224, 384, 4
    model = MannequinChallengeModel(checkpoint="", seed=0)
    params0 = model.variables["params"]
    batch_stats0 = model.variables.get("batch_stats", {})
    weights = LossWeights(lambda_view_baseline=0.1, lambda_reprojection=1.0)

    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.random((B, 2, H, W, 3)), jnp.float32),
        "flows": jnp.asarray(
            rng.standard_normal((B, 2, H, W, 2)) * 2, jnp.float32),
        "masks": jnp.asarray(rng.random((B, 2, H, W)) > 0.2, jnp.float32),
        "intrinsics": jnp.tile(
            jnp.asarray([W * 1.2, W * 1.2, W / 2, H / 2], jnp.float32),
            (B, 2, 1)),
        "extrinsics": jnp.tile(
            jnp.concatenate(
                [jnp.eye(3, dtype=jnp.float32),
                 jnp.zeros((3, 1), jnp.float32)], 1), (B, 2, 1, 1)),
    }

    def loss_fn(params, bstats):
        v = {"params": params}
        if bstats:
            v["batch_stats"] = bstats
        depth, mut = model.apply(v, batch["images"], train=True)
        loss, _ = joint_loss(
            depth, batch["intrinsics"], batch["extrinsics"],
            batch["flows"], batch["masks"], weights)
        return loss, mut.get("batch_stats", bstats)

    opt = optax.flatten(optax.adam(4e-4))
    opt_state0 = opt.init(params0)

    flat0, unravel = jax.flatten_util.ravel_pytree(params0)
    flat_opt = optax.adam(4e-4)
    flat_opt_state0 = flat_opt.init(flat0)

    def chain(step, carry0, iters):
        @jax.jit
        def loop():
            def body(c, _):
                return step(c), None
            c, _ = jax.lax.scan(body, carry0, None, length=iters)
            return jax.tree_util.tree_leaves(c)[0].ravel()[:1]
        return loop

    def report(name, sec):
        print(json.dumps({"variant": name, "ms": round(sec * 1e3, 2)}),
              flush=True)

    # 1. fwd+bwd only
    def fwd_bwd(c):
        params, bstats = c
        (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bstats)
        # touch grads so nothing is DCE'd; keep params evolving slightly
        p = jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, params, g)
        return (p, new_bs)

    report("fwd_bwd", slope_timed(
        lambda n: chain(fwd_bwd, (params0, batch_stats0), n)))

    # 2. + flattened Adam, no guard
    def adam_noguard(c):
        params, bstats, os_ = c
        (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bstats)
        up, os2 = opt.update(g, os_, params)
        p = jax.tree_util.tree_map(lambda a, u: a + u, params, up)
        return (p, new_bs, os2)

    report("adam_noguard", slope_timed(
        lambda n: chain(adam_noguard, (params0, batch_stats0, opt_state0), n)))

    # 3. the production pattern: separate guard ravel + masked apply
    def full(c):
        params, bstats, os_ = c
        (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bstats)
        up, os2 = opt.update(g, os_, params)
        fg, _ = jax.flatten_util.ravel_pytree(g)
        ok = jnp.isfinite(loss) & jnp.all(jnp.isfinite(fg))
        p = jax.tree_util.tree_map(
            lambda a, u: a + jnp.where(ok, u, jnp.zeros((), u.dtype)),
            params, up)
        os3 = jax.tree_util.tree_map(
            lambda x, y: jnp.where(ok, x, y), os2, os_)
        return (p, new_bs, os3)

    report("full", slope_timed(
        lambda n: chain(full, (params0, batch_stats0, opt_state0), n)))

    # 4. flat-state redesign: one ravel lives in the state, the
    # unravel happens inside the forward, everything else is flat
    def flat_loss(flat_params, bstats):
        return loss_fn(unravel(flat_params), bstats)

    def flat_state(c):
        fp, bstats, os_ = c
        (loss, new_bs), fg = jax.value_and_grad(flat_loss, has_aux=True)(
            fp, bstats)
        up, os2 = flat_opt.update(fg, os_, fp)
        ok = jnp.isfinite(loss) & jnp.all(jnp.isfinite(fg))
        fp2 = fp + jnp.where(ok, up, jnp.zeros((), up.dtype))
        os3 = jax.tree_util.tree_map(
            lambda x, y: jnp.where(ok, x, y), os2, os_)
        return (fp2, new_bs, os3)

    report("flat_state", slope_timed(
        lambda n: chain(flat_state, (flat0, batch_stats0, flat_opt_state0), n)))

    # 5. resize matmuls at default precision under bf16
    layers.set_resize_precision("default")
    try:
        report("full_resize_default", slope_timed(
            lambda n: chain(full, (params0, batch_stats0, opt_state0), n)))
    finally:
        layers.set_resize_precision("highest")


if __name__ == "__main__":
    main()
