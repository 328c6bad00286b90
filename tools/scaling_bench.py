"""Multi-chip scaling diagnostics on the virtual CPU mesh.

Real multi-chip hardware is unavailable here, so this bounds the
data-parallel overhead structurally:

1. weak-scaling curve: per-step wall-clock of the compiled train step at
   n = 1, 2, 4, 8 virtual devices with batch = n (CPU timing — only the
   TREND is meaningful);
2. HLO collective audit of the 8-device program: every all-reduce in the
   compiled module, with shapes — proof the gradient psum happens once
   per step and nothing else crosses the mesh.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")


def build(n_devices, H=32, W=32):
    from consistent_depth_tpu.models.mannequin_challenge import (
        MannequinChallengeModel,
    )
    from consistent_depth_tpu.ops.losses import LossWeights
    from consistent_depth_tpu.parallel import make_mesh
    from consistent_depth_tpu.training import TrainingEngine, create_optimizer

    mesh = make_mesh(n_devices) if n_devices > 1 else None
    engine = TrainingEngine(
        MannequinChallengeModel(checkpoint="", seed=0),
        create_optimizer("Adam", 4e-4), LossWeights(), mesh=mesh)

    rng = np.random.default_rng(0)
    F, P = 4, max(n_devices, 4)
    data = {
        "frames": rng.random((F, H, W, 3)).astype(np.float32),
        "pair_slots": (np.arange(P * 2, dtype=np.int32) % F).reshape(P, 2),
        "pair_ids": (np.arange(P * 2, dtype=np.int32) % F).reshape(P, 2),
        "flows": rng.standard_normal((P, 2, H, W, 2)).astype(np.float32),
        "masks": np.ones((P, 2, H, W), np.float32),
        "intrinsics": np.tile(
            np.array([W, W, W / 2, H / 2], np.float32), (P, 2, 1)),
        "extrinsics": np.tile(
            np.concatenate([np.eye(3, dtype=np.float32),
                            np.zeros((3, 1), np.float32)], 1), (P, 2, 1, 1)),
    }
    state = engine.init_state()
    dev = engine.put_data(data)
    idx = np.arange(n_devices, dtype=np.int32) % P
    valid = np.ones(n_devices, np.float32)
    return engine, state, dev, idx, valid


def weak_scaling():
    rows = []
    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            break
        engine, state, dev, idx, valid = build(n)
        state, m = engine.train_step(state, dev, idx, valid)  # compile
        np.asarray(jax.device_get(m["loss"]))
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            state, m = engine.train_step(state, dev, idx, valid)
        np.asarray(jax.device_get(m["loss"]))
        dt = (time.perf_counter() - t0) / iters
        rows.append({"devices": n, "batch": n,
                     "step_ms": round(dt * 1e3, 2)})
        print(json.dumps(rows[-1]), flush=True)
    if len(rows) > 1:
        eff = rows[0]["step_ms"] / rows[-1]["step_ms"]
        print(json.dumps({
            "weak_scaling_efficiency": round(eff, 3),
            "note": "CAVEAT: virtual CPU devices share one physical "
                    "host, so this mostly measures core oversubscription"
                    " — it LOWER-bounds real-hardware weak scaling. The "
                    "collective audit below is the structural evidence.",
        }), flush=True)


def collective_audit(n=8):
    engine, state, dev, idx, valid = build(n)
    lowered = engine._train_step.lower(state, dev, idx, valid)
    hlo = lowered.compile().as_text()
    counts = {}
    for m in re.finditer(
            r"(all-reduce(?:-start)?|all-gather(?:-start)?|reduce-scatter|"
            r"collective-permute|all-to-all)\(", hlo):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    shapes = re.findall(r"= (\S+) all-reduce(?:-start)?\(", hlo)
    print(json.dumps({
        "hlo_collectives_8dev": counts,
        "all_reduce_example_shapes": shapes[:5],
        "note": "expected: one all-reduce per gradient tensor (the "
                "data-parallel psum; XLA overlaps them with compute) "
                "plus small all-gathers for the per-sample loss vector",
    }), flush=True)


if __name__ == "__main__":
    weak_scaling()
    collective_audit()
