"""Decompose the train-step time on the real chip: model forward (eval
and train BN modes), forward+backward, loss chain, optimizer — each
slope-timed in isolation to localize the cost of the 147 ms step.

Usage: python tools/step_profile.py [--dtype bf16]
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import os as _os
import sys as _sys

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
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--no-s2d", action="store_true")
    args = ap.parse_args()

    from consistent_depth_tpu.utils.jit_cache import (
        enable_persistent_jit_cache,
    )

    enable_persistent_jit_cache()
    from consistent_depth_tpu.models import layers
    from consistent_depth_tpu.models.mannequin_challenge import (
        MannequinChallengeModel,
    )
    from consistent_depth_tpu.ops.losses import LossWeights, joint_loss
    from consistent_depth_tpu.training import TrainingEngine, create_optimizer

    if args.no_s2d:
        layers.set_s2d_enabled(False)

    H, W, B = 224, 384, 4
    engine = TrainingEngine(
        MannequinChallengeModel(checkpoint="", seed=0),
        create_optimizer("Adam", 4e-4),
        LossWeights(lambda_view_baseline=0.1, lambda_reprojection=1.0),
        precision=args.dtype if args.dtype == "bf16" else "f32")
    model = engine.model
    state = engine.init_state()

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, 2, H, W, 3)), jnp.float32)
    flows = jnp.asarray(rng.standard_normal((B, 2, H, W, 2)) * 2,
                        jnp.float32)
    masks = jnp.asarray((rng.random((B, 2, H, W)) > 0.2), jnp.float32)
    intr = jnp.tile(jnp.asarray([W * 1.2, W * 1.2, W / 2, H / 2],
                                jnp.float32), (B, 2, 1))
    extr = jnp.tile(
        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1
                        ).astype(jnp.float32), (B, 2, 1, 1))
    weights = engine.weights

    def variables(params):
        v = {"params": params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return v

    def report(name, sec):
        print(json.dumps({"part": name, "ms": round(sec * 1e3, 2)}),
              flush=True)

    def chain(fn, iters):
        # data-depend each iteration through a scalar scale on params
        @jax.jit
        def loop():
            def body(c, _):
                scale = (1.0 + 1e-30 * c)
                p = jax.tree_util.tree_map(
                    lambda t: (t * scale).astype(t.dtype), state.params)
                out = fn(p)
                return jnp.asarray(out, jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c
        return loop

    # 1. forward, eval-mode BN
    def fwd_eval(p):
        depth, _ = model.apply(variables(p), images, train=False)
        return jnp.mean(depth)
    report("fwd_eval", slope_timed(lambda n: chain(fwd_eval, n)))

    # 2. forward, train-mode BN (batch statistics)

    def fwd_train(p):
        out, _ = model.apply(variables(p), images, train=True)
        return jnp.mean(out)
    report("fwd_train", slope_timed(lambda n: chain(fwd_train, n)))

    # 3. forward + backward (grad of mean depth)
    def fwd_bwd(p):
        def f(p):
            out, _ = model.apply(variables(p), images, train=True)
            return jnp.mean(out)
        # consume EVERY grad leaf or XLA dead-code-eliminates most of
        # the backward (sum of sums = global use of the whole cotangent)
        return sum(jnp.sum(g)
                   for g in jax.tree_util.tree_leaves(jax.grad(f)(p)))
    report("fwd_bwd", slope_timed(lambda n: chain(fwd_bwd, n)))

    # 4. loss chain alone (no network: depth given)
    depth0 = jnp.asarray(rng.random((B, 2, H, W)) + 0.5, jnp.float32)

    def loss_only(p):
        del p
        loss, _ = joint_loss(depth0, intr, extr, flows, masks, weights)
        return loss
    report("loss_chain_fwd", slope_timed(lambda n: chain(loss_only, n)))

    def loss_grad(p):
        del p
        g = jax.grad(lambda d: joint_loss(
            d, intr, extr, flows, masks, weights)[0])(depth0)
        return jnp.mean(g)
    report("loss_chain_fwd_bwd", slope_timed(lambda n: chain(loss_grad, n)))

    # 5. full train step via the engine (per-step, includes opt update)
    data = {
        "frames": np.asarray(rng.random((8, H, W, 3)), np.float32),
        "pair_slots": np.arange(8, dtype=np.int32).reshape(4, 2),
        "pair_ids": np.arange(8, dtype=np.int32).reshape(4, 2),
        "flows": np.asarray(flows), "masks": np.asarray(masks),
        "intrinsics": np.asarray(intr), "extrinsics": np.asarray(extr),
    }
    dev = engine.put_data(data)
    idx = np.arange(4, dtype=np.int32)
    valid = np.ones(4, np.float32)
    st = state
    st, m = engine.train_step(st, dev, idx, valid)
    np.asarray(jax.device_get(m["loss"]))
    for label, n in (("one", 10),):
        t0 = time.perf_counter()
        for _ in range(n):
            st, m = engine.train_step(st, dev, idx, valid)
        np.asarray(jax.device_get(m["loss"]))
        report("train_step_dispatched", (time.perf_counter() - t0) / n)


if __name__ == "__main__":
    main()
