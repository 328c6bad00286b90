"""Measured-input wall-clock model for the fine-tune stage on a v5e
data-parallel mesh.

Answers the question the single-chip bench cannot: what does the
20-epoch ayush fine-tune cost on a v5e-8 (BASELINE.md north star:
< 240 s), using only quantities this environment can actually measure
or audit —

- single-chip steady-state step times (bench.py on the real chip);
- per-step ICI collective bytes from the AOT-compiled 8-chip programs
  (tools/topology_bench.py -> TOPOLOGY_v5e8.json);
- measured host-side per-epoch work (eval artifact writes, checkpoint
  export, TB/bookkeeping) and device->host fetch time.

The model is validated by predicting the measured single-chip number
from the same inputs (tools/v5e8_projection.py asserts the error bound
and records it next to the projection).

Scaling assumptions, all standard data-parallel practice and matching
``DepthFineTuner``'s actual behavior (fine_tuning.py:139-144 scales the
global batch by the device count, so steps-per-epoch shrink N-fold):

- per-chip per-step compute time is the measured single-chip value (the
  per-chip batch stays BATCH_PER_CHIP; XLA programs are identical
  modulo collectives);
- the gradient all-reduce rides the slice's ICI ring at
  ``2 (N-1)/N x bytes / ring_bw`` (bidirectional ring over the v5e-8's
  long axis);
- host work does not shrink with N; under the dispatch-ahead pipeline
  (fine_tuning.py:259-380) it overlaps device compute, so a cycle costs
  ``max(device, host)`` on a real host, and ``device + host`` on a
  transport that serializes transfers behind programs (the tunneled
  bench chip) — both are reported.
"""

from __future__ import annotations

from dataclasses import dataclass, asdict
from typing import Dict

# v5e ICI: one-way per-link bandwidth ~4.5e10 B/s; a ring all-reduce
# uses both directions of the ring axis => ~9e10 B/s of ring bandwidth
# per chip. (Public v5e numbers as tabulated in jax-ml.github.io/
# scaling-book; the projection's ICI sensitivity is tiny — the demo
# all-reduce is ~33 MB/step ~= 0.6 ms against a ~100 ms step.)
V5E_ICI_RING_BW = 9.0e10


@dataclass
class MeasuredInputs:
    """Everything the model consumes, with the measurement source."""

    # single-chip steady state (bench.py, real chip, bf16)
    train_step_s: float          # per train step at per-chip batch
    eval_fwd_step_s: float       # dedup eval: per frame-forward chunk
    eval_loss_step_s: float      # dedup eval: per loss-only step
    # host side (tools/v5e8_projection.py, measured at demo scale)
    fetch_eval_s: float          # fetch of the per-frame depth buffer
    host_eval_s: float           # process_eval: .raw/.png/json writes
    host_ckpt_s: float           # torch-layout checkpoint export
    host_step_s: float           # per-step bookkeeping (prints, TB)
    # workload shape
    n_pairs: int
    n_frames: int
    batch_per_chip: int
    epochs: int
    # 8-chip program audit (TOPOLOGY_v5e8.json)
    allreduce_bytes_per_step: float
    ici_ring_bw: float = V5E_ICI_RING_BW


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def project(m: MeasuredInputs, n_chips: int,
            overlap_host: bool) -> Dict[str, float]:
    """Project the 20-epoch fine-tune wall-clock on ``n_chips``.

    Returns a dict with the per-phase split so the projection is
    auditable, not a single opaque number.
    """
    batch = m.batch_per_chip * n_chips
    train_steps = _ceil_div(m.n_pairs, batch)
    # dedup eval shapes (engine.eval_epoch): frame chunks of (B, 2),
    # loss steps mirror the train pair batches
    fwd_steps = max(1, _ceil_div(m.n_frames, 2 * batch))
    loss_steps = train_steps

    t_allreduce = (
        2.0 * (n_chips - 1) / n_chips
        * m.allreduce_bytes_per_step / m.ici_ring_bw
        if n_chips > 1 else 0.0)

    device_train = train_steps * (m.train_step_s + t_allreduce)
    device_eval = (fwd_steps * m.eval_fwd_step_s
                   + loss_steps * m.eval_loss_step_s)
    device_epoch = device_train + device_eval

    host_epoch = (m.host_eval_s + m.host_ckpt_s
                  + train_steps * m.host_step_s + m.fetch_eval_s)

    if overlap_host:
        cycle = max(device_epoch, host_epoch)
    else:
        cycle = device_epoch + host_epoch

    # epochs cycles + the pre-training eval (validate(0,0)) + the final
    # epoch's host work draining with nothing left to hide it under
    total = m.epochs * cycle + device_eval + m.fetch_eval_s
    if overlap_host:
        total += host_epoch
    return {
        "n_chips": n_chips,
        "train_steps_per_epoch": train_steps,
        "eval_fwd_steps": fwd_steps,
        "allreduce_s_per_step": round(t_allreduce, 6),
        "device_train_epoch_s": round(device_train, 3),
        "device_eval_epoch_s": round(device_eval, 3),
        "host_epoch_s": round(host_epoch, 3),
        "cycle_s": round(cycle, 3),
        "overlap_host": overlap_host,
        "total_s": round(total, 2),
    }


def validate_against_single_chip(m: MeasuredInputs,
                                 measured_total_s: float) -> Dict[str, float]:
    """Predict the single-chip 20-epoch number from the same inputs and
    report the relative error vs the measured bench value.

    The bench's cycle has no eval-artifact/checkpoint host work (it
    fetches only), so the comparable prediction zeroes those terms and
    serializes the fetch like the tunneled transport does.
    """
    bench_like = MeasuredInputs(**{
        **asdict(m), "host_eval_s": 0.0, "host_ckpt_s": 0.0,
        "host_step_s": 0.0,
    })
    pred = project(bench_like, n_chips=1, overlap_host=False)
    err = (pred["total_s"] - measured_total_s) / measured_total_s
    return {
        "predicted_single_chip_s": pred["total_s"],
        "measured_single_chip_s": round(measured_total_s, 2),
        "model_error_pct": round(100 * err, 1),
    }
