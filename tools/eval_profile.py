"""Decompose the scanned eval-epoch step time on the real chip.

The eval pass (engine.eval_epoch) amortizes to ~47 ms/step while its
known parts (train-BN forward ~31 ms + loss forward ~5 ms) sum to ~36;
this tool slope-times the eval body in four growing configurations to
localize the rest:

1. fwd+loss        — gather_batch + _loss (no depth dedup, no metrics)
2. +stats carry    — batch_stats threaded through the scan carry
3. +depth dedup    — the first-seen per-frame depth buffer writes
4. full eval_epoch — the production program (includes metric stacking)

Usage: python tools/eval_profile.py [--steps 16]
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


def timed(fn, fetch, n=2):
    fetch(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    from consistent_depth_tpu.utils.jit_cache import (
        enable_persistent_jit_cache,
    )

    enable_persistent_jit_cache()
    from consistent_depth_tpu.models.mannequin_challenge import (
        MannequinChallengeModel,
    )
    from consistent_depth_tpu.ops.losses import LossWeights
    from consistent_depth_tpu.training import TrainingEngine, create_optimizer
    from consistent_depth_tpu.training.engine import gather_batch

    H, W, B, N_FRAMES = 224, 384, 4, 244
    S = args.steps
    engine = TrainingEngine(
        MannequinChallengeModel(checkpoint="", seed=0),
        create_optimizer("Adam", 4e-4),
        LossWeights(lambda_view_baseline=0.1, lambda_reprojection=1.0),
        precision=args.dtype)
    state = engine.init_state()

    rng = np.random.default_rng(0)
    P = 64
    data = {
        "frames": np.asarray(rng.random((N_FRAMES, H, W, 3)), np.float32),
        "pair_slots": (np.arange(2 * P, dtype=np.int32) % N_FRAMES
                       ).reshape(P, 2),
        "pair_ids": np.arange(2 * P, dtype=np.int32).reshape(P, 2),
        "flows": np.asarray(
            rng.standard_normal((P, 2, H, W, 2)) * 2, np.float32),
        "masks": np.asarray(rng.random((P, 2, H, W)) > 0.2, np.float32),
        "intrinsics": np.tile(
            np.asarray([W * 1.2, W * 1.2, W / 2, H / 2], np.float32),
            (P, 2, 1)),
        "extrinsics": np.tile(np.concatenate(
            [np.eye(3), np.zeros((3, 1))], 1).astype(np.float32),
            (P, 2, 1, 1)),
    }
    dev = engine.put_data(data)
    idx = (np.arange(S * B, dtype=np.int32) % P).reshape(S, B)
    valid = np.ones((S, B), np.float32)
    idx_j, valid_j = jnp.asarray(idx), jnp.asarray(valid)

    def fetch(x):
        return np.asarray(jax.device_get(x))

    def report(name, sec):
        print(json.dumps(
            {"part": name, "ms_per_step": round(sec * 1e3 / S, 2),
             "total_ms": round(sec * 1e3, 1)}), flush=True)

    # NOTE: `dev` must be an ARGUMENT of every jitted probe — closed
    # over, the 250 MB dataset becomes a program constant and the
    # tunneled remote-compile request exceeds its body-size limit.

    # 1. forward+loss only, loss scalar accumulated, stats NOT carried
    @jax.jit
    def run_fwd_loss(state, dev, idx, valid):
        def body(acc, step):
            si, sv = step
            batch = gather_batch(dev, si)
            loss, _ = engine._loss(
                state.params, state.batch_stats, batch, sv, True)
            return acc + loss, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), (idx, valid))
        return acc

    report("fwd_loss", timed(
        lambda: run_fwd_loss(state, dev, idx_j, valid_j), fetch))

    # 2. + batch_stats carried through the scan (the real eval threads
    # updated running stats into the next step)
    @jax.jit
    def run_stats_carry(state, dev, idx, valid):
        def body(carry, step):
            st, acc = carry
            si, sv = step
            new_st, m = engine._eval_step_impl(st, dev, si, sv)
            del m
            return (new_st, acc + 0.0), None
        (st, acc), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                    (idx, valid))
        return st.batch_stats

    report("stats_carry_nometrics", timed(
        lambda: run_stats_carry(state, dev, idx_j, valid_j), fetch))

    # 3. full production eval epoch (metrics stacked + depth dedup)
    report("eval_epoch_full", timed(
        lambda: engine.eval_epoch(state, dev, idx, valid)[1]["loss"],
        fetch))

    # 4. eval epoch minus the depth write-back: same body but depth
    # discarded
    @jax.jit
    def run_no_dedup(state, dev, idx, valid):
        def body(carry, step):
            st = carry
            si, sv = step
            new_st, m = engine._eval_step_impl(st, dev, si, sv)
            m.pop("depth")
            return new_st, m
        st, metrics = jax.lax.scan(body, state, (idx, valid))
        return metrics["loss"]

    report("eval_epoch_no_dedup", timed(
        lambda: run_no_dedup(state, dev, idx_j, valid_j), fetch))


if __name__ == "__main__":
    main()
