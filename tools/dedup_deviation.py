"""Quantify the bf16 dedup-eval deviation at demo scale (round-3
VERDICT weak #3 / next-round #6).

The production bf16 eval pass forwards each unique frame ONCE
(engine._eval_epoch_dedup_impl) instead of once per pair side like the
reference validation loop (depth_fine_tuning.py:312-341) and the f32
paired pass (engine._eval_epoch_impl). The two passes are the same
math except for BN batch composition: the paired pass normalizes each
frame against the statistics of whatever pair batch it appears in
(running stats drifting batch to batch), the dedup pass against its
frame chunk. This tool runs BOTH passes from IDENTICAL state on the
real chip at demo scale and reports the actual per-pair loss and
per-frame depth deltas, at two operating points:

  random-init  the pre-training validate(0, 0) — the worst case (BN
               batch statistics far from any stationary point)
  trained      after 3 training epochs — the state every other eval
               sees (BN running stats near the data statistics)

Usage: python tools/dedup_deviation.py [--epochs 3]
Prints one JSON document (referenced by PERF.md and the band pinned by
tests/test_eval_dedup.py).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402


def fetch(x):
    return np.asarray(jax.device_get(x))


def loss_table(engine, state, dev_data, idx, valid):
    """Run the engine's eval pass from ``state`` WITHOUT mutating it
    (eval_epoch is non-donating) and return per-pair loss arrays + the
    depth buffer. The dedup/paired choice is a CONSTRUCTION-time
    property of the engine (its program is compiled in __init__), so
    the caller passes one engine per variant."""
    _, m = engine.eval_epoch(state, dev_data, idx, valid)
    return {k: fetch(v) for k, v in m.items()
            if k in ("reprojection", "disparity", "loss",
                     "depth_frames", "frames_seen")}


def compare(md, mp, n_pairs):
    rep_d = md["reprojection"].reshape(-1)[:n_pairs]
    rep_p = mp["reprojection"].reshape(-1)[:n_pairs]
    dis_d = md["disparity"].reshape(-1)[:n_pairs]
    dis_p = mp["disparity"].reshape(-1)[:n_pairs]

    def rel(a, b):
        d = np.abs(a - b) / np.maximum(np.abs(b), 1e-12)
        return {"median": round(float(np.median(d)), 5),
                "p95": round(float(np.percentile(d, 95)), 5),
                "max": round(float(d.max()), 5)}

    seen = mp["frames_seen"] & md["frames_seen"]
    dd = md["depth_frames"].astype(np.float32)[seen]
    dp = mp["depth_frames"].astype(np.float32)[seen]
    depth_rel = np.abs(dd - dp) / np.maximum(np.abs(dp), 1e-12)
    return {
        "per_pair_loss_rel": {
            "reprojection": rel(rep_d, rep_p),
            "disparity": rel(dis_d, dis_p),
        },
        "mean_loss_rel": round(float(
            abs(md["loss"].mean() - mp["loss"].mean())
            / abs(mp["loss"].mean())), 6),
        "depth_rel": {
            "median": round(float(np.median(depth_rel)), 6),
            "p95": round(float(np.percentile(depth_rel, 95)), 6),
            "max": round(float(depth_rel.max()), 5),
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    from consistent_depth_tpu.utils.jit_cache import (
        enable_persistent_jit_cache,
    )

    enable_persistent_jit_cache()

    import bench
    from consistent_depth_tpu.models.mannequin_challenge import (
        MannequinChallengeModel,
    )
    from consistent_depth_tpu.ops.losses import LossWeights
    from consistent_depth_tpu.training import (
        TrainingEngine, create_optimizer,
    )

    data, P = bench.make_workload()
    batch = bench.BATCH_PER_CHIP
    steps = int(np.ceil(P / batch))

    model = MannequinChallengeModel(checkpoint="", seed=0)
    weights = LossWeights(lambda_view_baseline=0.1,
                          lambda_reprojection=1.0)

    def make_engine(dedup):
        return TrainingEngine(
            model, create_optimizer("Adam", 4e-4), weights,
            mesh=None, precision="bf16", eval_dedup=dedup)

    # the dedup/paired choice is compiled into the engine's programs;
    # both engines share the model + state layout, so one state feeds
    # both eval passes
    engine = make_engine(True)           # production (dedup) + training
    engine_p = make_engine(False)        # paired-eval twin
    state = engine.init_state()
    dev_data = engine.put_data(data)

    rng = np.random.default_rng(1)
    order = np.arange(steps * batch) % P
    rng.shuffle(order)
    idx = order.reshape(steps, batch).astype(np.int32)
    valid = np.ones_like(idx, np.float32)

    report = {"workload": {"frames": bench.N_FRAMES, "pairs": P,
                           "batch": batch, "precision": "bf16"}}

    t0 = time.perf_counter()
    md = loss_table(engine, state, dev_data, idx, valid)
    mp = loss_table(engine_p, state, dev_data, idx, valid)
    report["random_init"] = compare(md, mp, P)
    print(f"[dedup_deviation] random-init done "
          f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)

    for _ in range(args.epochs):
        state, m = engine.train_epoch(state, dev_data, idx, valid)
    fetch(m["loss"])

    md = loss_table(engine, state, dev_data, idx, valid)
    mp = loss_table(engine_p, state, dev_data, idx, valid)
    report[f"after_{args.epochs}_epochs"] = compare(md, mp, P)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
