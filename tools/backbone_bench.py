"""Per-backbone train/eval step time at production shapes on the real
chip.

The mc hourglass has the full decomposition in PERF.md; this tool adds
the other two CLI model families so the perf story covers every
backbone. Default shapes mirror each model's production feed:

- mc:         batch 4 pairs of 224x384 (the ayush demo shape)
- midas2:     batch 4 pairs of 224x384 (align 32 — same demo shape)
- monodepth2: batch 4 pairs of 224x384 frames bicubic-fed at 320x1024
  (the kitti preset feed, monodepth2.py feed_height/width)

Slope-timed scans with value-fetch barriers (tools/mxu_bench.py
explains why). Usage: python tools/backbone_bench.py [--models mc ...]
"""

import argparse
import json
import os as _os
import sys as _sys
import time

import numpy as np

import jax
import jax.numpy as jnp

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def slope_timed(make_loop, iters, repeats=2):
    """Best-of-`repeats` slope between a short and a 3x run — the
    tunnel's transfer variance can otherwise swamp a single pair."""
    lo, hi = make_loop(iters), make_loop(3 * iters)
    np.asarray(jax.device_get(lo()))
    np.asarray(jax.device_get(hi()))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(lo()))
        t1 = time.perf_counter()
        np.asarray(jax.device_get(hi()))
        t2 = time.perf_counter()
        best = min(best, max((t2 - t1) - (t1 - t0), 1e-9) / (2 * iters))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*",
                    default=["mc", "midas2", "monodepth2"])
    ap.add_argument("--steps", type=int, default=16,
                    help="steps per epoch program; per-program dispatch "
                         "(~25 ms on this tunnel) amortizes over this")
    ap.add_argument("--precision", default="bf16")
    args = ap.parse_args()

    from consistent_depth_tpu.utils.jit_cache import (
        enable_persistent_jit_cache,
    )

    enable_persistent_jit_cache()
    from consistent_depth_tpu.models.registry import create_depth_model
    from consistent_depth_tpu.ops.losses import LossWeights
    from consistent_depth_tpu.training import (
        TrainingEngine, create_optimizer,
    )

    H, W, B, N_FRAMES, P = 224, 384, 4, 16, 16
    rng = np.random.default_rng(0)
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

    for name in args.models:
        model = create_depth_model(name, checkpoint="")
        engine = TrainingEngine(
            model, create_optimizer("Adam", 1e-4),
            LossWeights(lambda_view_baseline=0.1, lambda_reprojection=1.0),
            precision=args.precision)
        state0 = engine.init_state()
        dev = engine.put_data(data)
        # one-program state clone: train_epoch donates its input, so
        # each timed run starts from a fresh snapshot (init_state would
        # add a big, variance-prone constant to both run lengths)
        snapshot = jax.jit(
            lambda s: jax.tree_util.tree_map(jnp.copy, s))

        S = args.steps
        idx = (np.arange(S * B, dtype=np.int32) % P).reshape(S, B)
        valid = np.ones((S, B), np.float32)

        def train_loop(iters):
            steps = iters // S
            blocks = [(jnp.asarray(idx), jnp.asarray(valid))] * steps

            def run():
                st = snapshot(state0)
                loss = None
                for bi, bv in blocks:
                    st, m = engine.train_epoch(st, dev, bi, bv)
                    loss = m["loss"]
                return loss
            return run

        def eval_loop(iters):
            steps = iters // S
            blocks = [(jnp.asarray(idx), jnp.asarray(valid))] * steps

            def run():
                st = state0
                loss = None
                for bi, bv in blocks:
                    st, m = engine.eval_epoch(st, dev, bi, bv)
                    loss = m["loss"]
                return loss
            return run

        train_ms = slope_timed(train_loop, 2 * S) * 1e3
        eval_ms = slope_timed(eval_loop, 2 * S) * 1e3
        n_params = sum(
            x.size for x in jax.tree_util.tree_leaves(state0.params))
        print(json.dumps({
            "model": name, "params_m": round(n_params / 1e6, 1),
            "precision": args.precision, "batch_pairs": B,
            "shape": [H, W],
            "train_step_ms": round(train_ms, 2),
            "eval_step_ms": round(eval_ms, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
