"""Unit tests of the v5e-8 wall-clock model (pure arithmetic; the
measured inputs come from tools/v5e8_projection.py on the real chip)."""

import numpy as np

from consistent_depth_tpu.parallel.projection import (
    MeasuredInputs,
    project,
    validate_against_single_chip,
)


def _inputs(**overrides):
    base = dict(
        train_step_s=0.0969, eval_fwd_step_s=0.082,
        eval_loss_step_s=0.006, fetch_eval_s=0.9,
        host_eval_s=3.0, host_ckpt_s=0.4, host_step_s=0.001,
        n_pairs=715, n_frames=244, batch_per_chip=4, epochs=20,
        allreduce_bytes_per_step=32_847_316.0,
    )
    base.update(overrides)
    return MeasuredInputs(**base)


def test_step_counts_shrink_with_chips():
    m = _inputs()
    p1 = project(m, 1, overlap_host=True)
    p8 = project(m, 8, overlap_host=True)
    assert p1["train_steps_per_epoch"] == 179
    assert p8["train_steps_per_epoch"] == 23   # ceil(715/32)
    assert p1["eval_fwd_steps"] == 31          # ceil(244/8)
    assert p8["eval_fwd_steps"] == 4           # ceil(244/64)
    assert p8["total_s"] < p1["total_s"] / 3


def test_allreduce_term_only_multichip():
    m = _inputs()
    assert project(m, 1, overlap_host=True)["allreduce_s_per_step"] == 0
    t = project(m, 8, overlap_host=True)["allreduce_s_per_step"]
    # 2*(7/8)*32.8MB / 90 GB/s ~= 0.64 ms — small vs the ~97 ms step
    assert 0.0003 < t < 0.002


def test_overlap_bounds_serialized():
    m = _inputs()
    po = project(m, 8, overlap_host=True)
    ps = project(m, 8, overlap_host=False)
    assert po["total_s"] <= ps["total_s"]
    # overlapped cycle = max(device, host); serialized = sum
    assert np.isclose(
        ps["cycle_s"],
        po["device_train_epoch_s"] + po["device_eval_epoch_s"]
        + po["host_epoch_s"], atol=1e-2)


def test_validation_reproduces_bench_accounting():
    """The bench-comparable prediction (no artifact host work, fetch
    serialized) must reconstruct 20*cycle + pre-eval exactly from the
    same step times bench measured."""
    m = _inputs()
    device_train = 179 * m.train_step_s
    device_eval = 31 * m.eval_fwd_step_s + 179 * m.eval_loss_step_s
    expect = (20 * (device_train + device_eval + m.fetch_eval_s)
              + device_eval + m.fetch_eval_s)
    v = validate_against_single_chip(m, expect)
    assert abs(v["model_error_pct"]) < 0.5
