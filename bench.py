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
import jax.numpy as jnp

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


def traced_matmul_flops(fn, *args) -> float:
    """Sum executed conv/dot FLOPs in ``fn``'s jaxpr (recursing into
    scan/pjit/custom-vjp sub-jaxprs; scan bodies scaled by trip count)."""
    import jax.numpy as jnp  # noqa: F401
    from jax import core as jcore  # noqa: F401

    closed = jax.make_jaxpr(fn)(*args)

    def conv_eqn_flops(eqn) -> float:
        if not eqn.outvars:  # e.g. effect-only eqns inside scan bodies
            return 0.0
        out = eqn.outvars[0].aval.shape
        if eqn.primitive.name == "conv_general_dilated":
            rhs = eqn.invars[1].aval.shape
            dn = eqn.params["dimension_numbers"]
            # contraction = kernel spatial * C_in (rhs spec: kh kw ci co
            # for HWIO; use all dims except the output-feature one)
            co_dim = dn.rhs_spec[0]
            contraction = 1
            for i, d in enumerate(rhs):
                if i != co_dim:
                    contraction *= d
            n_out = 1
            for d in out:
                n_out *= d
            return 2.0 * n_out * contraction
        if eqn.primitive.name in ("dot_general",):
            lhs = eqn.invars[0].aval.shape
            (lc, _), _ = eqn.params["dimension_numbers"]
            contraction = 1
            for d in lc:
                contraction *= lhs[d]
            n_out = 1
            for d in out:
                n_out *= d
            return 2.0 * n_out * contraction
        return 0.0

    def as_jaxpr(v):
        # accept both ClosedJaxpr (.jaxpr) and raw Jaxpr (.eqns) params
        # — pallas_call carries its kernel as a raw Jaxpr
        if hasattr(v, "eqns"):
            return v
        return getattr(v, "jaxpr", None)

    def walk(jaxpr) -> float:
        total = 0.0
        for eqn in jaxpr.eqns:
            total += conv_eqn_flops(eqn)
            if eqn.primitive.name == "scan":
                mult = eqn.params.get("length", 1)
            elif eqn.primitive.name == "pallas_call":
                # kernel body executes once per grid program
                gm = eqn.params.get("grid_mapping")
                grid = getattr(gm, "grid", None) or \
                    eqn.params.get("grid", ())
                mult = 1
                for g in grid or ():
                    mult *= int(g)
            else:
                mult = 1
            for v in eqn.params.values():
                inner = as_jaxpr(v)
                if inner is not None:
                    total += mult * walk(inner)
                elif isinstance(v, (list, tuple)):
                    for w in v:
                        inner = as_jaxpr(w)
                        if inner is not None:
                            total += mult * walk(inner)
        return total

    return walk(closed.jaxpr)


def main():
    from consistent_depth_tpu.utils.jit_cache import (
        enable_persistent_jit_cache,
    )

    enable_persistent_jit_cache()
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

    # production-shaped cycle (fine_tuning.py's dispatch-ahead loop):
    # dispatch train(e)+eval(e), then fetch epoch e-1's metrics and
    # ~50 MB depth buffer while the device runs epoch e — the transfer
    # hides under compute, so a cycle costs max(compute, host) rather
    # than their sum. The tunneled chip's transfer stream shows up to 4x
    # run-to-run variance (PERF.md), so time each cycle individually and
    # take the median of 3 rather than a mean that one stall can poison.
    cycle_times = []
    prev = None
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = engine.train_epoch(state, dev_data, idx_mat, valid_mat)
        state, em = engine.eval_epoch(state, dev_data, idx_mat, valid_mat)
        if prev is not None:
            fetch(prev[0]["loss"])
            fetch(prev[1]["depth_frames"])
            fetch(prev[1]["loss"])
        prev = (m, em)
        fetch(m["loss"])  # barrier: this cycle's compute is done
        cycle_times.append(time.perf_counter() - t0)
    fetch(prev[1]["depth_frames"])
    cycle_s = float(np.median(cycle_times))

    # 20 train+eval cycles plus the pre-training eval
    projected = EPOCHS * cycle_s + eval_epoch_s

    # achieved FLOPS / MFU from an exact jaxpr walk (the axon platform's
    # compiled cost_analysis reports garbage): counts every executed
    # conv/dot flop in the train-epoch program, including the
    # structured-zero inflation of the space-to-depth kernels. The
    # USEFUL count re-traces the identical program with s2d disabled —
    # same math, native kernels, no zero padding — so mfu_useful is the
    # honest utilization (zero-padding FLOPs do occupy the MXU but do
    # no work).
    def _epoch_flops():
        return traced_matmul_flops(
            lambda s, d, i, v, c: engine._train_epoch_impl(s, d, i, v, c),
            state, dev_data, jnp.asarray(idx_mat), jnp.asarray(valid_mat),
            jnp.full((steps_per_epoch,), -1, jnp.int32))

    from consistent_depth_tpu.models import layers as _layers

    try:
        epoch_flops = _epoch_flops()
        try:
            _layers.set_s2d_enabled(False)
            useful_flops = _epoch_flops()
        finally:
            _layers.set_s2d_enabled(True)
    except Exception:  # pragma: no cover
        epoch_flops = useful_flops = 0.0
    achieved_tflops = epoch_flops / epoch_s / 1e12 if epoch_flops else None
    mfu = (epoch_flops / epoch_s / (n_chips * V5E_PEAK_BF16_FLOPS)
           if epoch_flops else None)
    mfu_useful = (useful_flops / epoch_s / (n_chips * V5E_PEAK_BF16_FLOPS)
                  if useful_flops else None)

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
            "cycle_s": round(cycle_s, 2),
            "fine_tune_baseline_s": FINE_TUNE_BASELINE_SECONDS,
            "end_to_end_baseline_s": END_TO_END_BASELINE_SECONDS,
            "vs_end_to_end": round(END_TO_END_BASELINE_SECONDS / projected, 2),
            "train_step_tflops": (
                round(achieved_tflops, 1) if achieved_tflops else None),
            "mfu": round(mfu, 3) if mfu else None,
            "mfu_useful": round(mfu_useful, 3) if mfu_useful else None,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
