"""Benchmark: projected wall-clock of the ayush-demo 20-epoch test-time
fine-tune on the available TPU chip(s).

Workload mirrors the reference demo config (R_hierarchical2_mc,
B0.1_R1.0_PL1-0_LR0.0004_BS4_Oadam — reference README.md:58-68):
MannequinChallenge hourglass, 384x224 depth frames, hierarchical2 pair
set over 244 frames, batch 4 per chip, Adam, geometric consistency
loss. Data is synthetic but shape/dtype-identical; the pipeline keeps
the whole dataset in HBM, so steady-state step time is the whole story.

Measures steady-state train-step latency (post-compile) and projects
the full 20-epoch fine-tune incl. the 21 eval passes, then compares
with the reference's demo figure (RTX 2080, README.md:43).

Baseline accounting: the reference's 37 min are END-TO-END (FlowNet2
flow + fine-tune + export; COLMAP precomputed). This projection covers
only the fine-tune stage, so ``vs_baseline`` divides by an estimated
fine-tune-only baseline: 37 min minus ~180 s of FlowNet2 flow (1430
directed pairs at the ~8 fps the FlowNet2 paper reports on comparable
hardware) and ~120 s of ffmpeg export => ~1920 s. The raw end-to-end
ratio is also reported in ``detail.vs_end_to_end``.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": "s", "vs_baseline": ...}
"""

import json
import os
import time

import numpy as np

import jax

END_TO_END_BASELINE_SECONDS = 37 * 60.0   # reference demo (README.md:43)
FINE_TUNE_BASELINE_SECONDS = 1920.0       # see module docstring
V5E_PEAK_BF16_FLOPS = 197e12              # v5e peak bf16 (per chip)
PRECISION = os.environ.get("BENCH_PRECISION", "bf16")  # bf16 | f32

N_FRAMES = 244
H, W = 224, 384
BATCH_PER_CHIP = 4
EPOCHS = 20


def make_workload(n_pairs_cap=None):
    from consistent_depth_tpu.utils import frame_range, frame_sampling

    fr = frame_range.FrameRange(
        frame_range.OptionalSet(), num_frames=N_FRAMES)
    opts = [frame_sampling.SamplePairsOptions(
        frame_sampling.SamplePairsMode.HIERARCHICAL2)]
    pairs = sorted(frame_sampling.SamplePairs.to_one_way(
        frame_sampling.SamplePairs.sample(opts, fr, two_way=True)))
    if n_pairs_cap:
        pairs = pairs[:n_pairs_cap]

    rng = np.random.default_rng(0)
    P = len(pairs)
    pair_arr = np.array(pairs, np.int32)
    data = {
        "frames": rng.random((N_FRAMES, H, W, 3), np.float32).astype(np.float32),
        "pair_slots": pair_arr,
        "pair_ids": pair_arr,
        "flows": (rng.standard_normal((P, 2, H, W, 2)) * 2).astype(np.float32),
        "masks": (rng.random((P, 2, H, W)) > 0.2).astype(np.float32),
        "intrinsics": np.tile(
            np.array([W * 1.2, W * 1.2, W / 2, H / 2], np.float32),
            (P, 2, 1)),
        "extrinsics": np.tile(
            np.concatenate([np.eye(3, dtype=np.float32),
                            np.zeros((3, 1), np.float32)], 1),
            (P, 2, 1, 1)),
    }
    return data, P


def main():
    from consistent_depth_tpu.models.mannequin_challenge import (
        MannequinChallengeModel,
    )
    from consistent_depth_tpu.ops.losses import LossWeights
    from consistent_depth_tpu.parallel import make_mesh
    from consistent_depth_tpu.training import TrainingEngine, create_optimizer

    devices = jax.devices()
    n_chips = len(devices)
    mesh = make_mesh() if n_chips > 1 else None
    batch = BATCH_PER_CHIP * n_chips

    data, P = make_workload()
    steps_per_epoch = int(np.ceil(P / batch))

    model = MannequinChallengeModel(checkpoint="", seed=0)
    engine = TrainingEngine(
        model, create_optimizer("Adam", 4e-4),
        LossWeights(lambda_view_baseline=0.1, lambda_reprojection=1.0),
        mesh=mesh, precision=PRECISION)
    state = engine.init_state()
    dev_data = engine.put_data(data)

    # epoch program: all steps under one lax.scan (the production path)
    rng2 = np.random.default_rng(1)
    order = np.arange(steps_per_epoch * batch) % P
    rng2.shuffle(order)
    idx_mat = order.reshape(steps_per_epoch, batch).astype(np.int32)
    valid_mat = np.ones_like(idx_mat, np.float32)

    # compile + warmup. NOTE: the only reliable execution barrier under
    # the axon remote platform is an actual VALUE FETCH (device_get);
    # block_until_ready can return before the program finishes and then
    # times dispatch only. Fetched buffers depend transitively on the
    # chained state, so one fetch at the end is an honest barrier.
    def fetch(x):
        return np.asarray(jax.device_get(x))

    state, em_ = engine.eval_epoch(state, dev_data, idx_mat, valid_mat)
    fetch(em_["loss"])
    state, m = engine.train_epoch(state, dev_data, idx_mat, valid_mat)
    fetch(m["loss"])

    # steady-state epoch timing
    n_timed = 2
    t0 = time.perf_counter()
    for _ in range(n_timed):
        state, m = engine.train_epoch(state, dev_data, idx_mat, valid_mat)
    fetch(m["loss"])
    epoch_s = (time.perf_counter() - t0) / n_timed
    train_step_s = epoch_s / steps_per_epoch

    # eval pass: one lax.scan program over the whole dataset (the
    # production path, engine.eval_epoch); includes fetching the
    # deduplicated per-frame depth buffer like the pipeline does
    t0 = time.perf_counter()
    for _ in range(n_timed):
        state, em = engine.eval_epoch(state, dev_data, idx_mat, valid_mat)
        fetch(em["depth_frames"])
    fetch(em["loss"])
    eval_epoch_s = (time.perf_counter() - t0) / n_timed
    eval_step_s = eval_epoch_s / steps_per_epoch

    projected = EPOCHS * epoch_s + (EPOCHS + 1) * eval_epoch_s

    # achieved FLOPS / MFU from the compiled epoch program's own cost
    # analysis (forward + backward + optimizer, the whole hot program)
    try:
        cost = (
            engine._train_epoch
            .lower(state, dev_data, idx_mat, valid_mat,
                   np.full(steps_per_epoch, -1, np.int32))
            .compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        epoch_flops = float(cost.get("flops", 0.0))
    except Exception:  # pragma: no cover - cost analysis unavailable
        epoch_flops = 0.0
    achieved_tflops = epoch_flops / epoch_s / 1e12 if epoch_flops else None
    mfu = (epoch_flops / epoch_s / (n_chips * V5E_PEAK_BF16_FLOPS)
           if epoch_flops else None)

    result = {
        "metric": "ayush_finetune_20epoch_projected_wallclock",
        "value": round(projected, 2),
        "unit": "s",
        "vs_baseline": round(FINE_TUNE_BASELINE_SECONDS / projected, 2),
        "detail": {
            "n_chips": n_chips,
            "precision": PRECISION,
            "pairs": P,
            "batch": batch,
            "steps_per_epoch": steps_per_epoch,
            "train_step_ms": round(train_step_s * 1e3, 2),
            "eval_step_ms": round(eval_step_s * 1e3, 2),
            "fine_tune_baseline_s": FINE_TUNE_BASELINE_SECONDS,
            "end_to_end_baseline_s": END_TO_END_BASELINE_SECONDS,
            "vs_end_to_end": round(END_TO_END_BASELINE_SECONDS / projected, 2),
            "train_step_tflops": (
                round(achieved_tflops, 1) if achieved_tflops else None),
            "mfu": round(mfu, 3) if mfu else None,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
