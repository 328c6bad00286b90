"""Bisect the train-step TPU code-size pathology (TOPOLOGY_v5e8.json:
304 MiB generated code, 642 s compile at v5e:2x4 — round-3 VERDICT
weak #2) by AOT-compiling program variants on a device-less topology
and reading the compiler's own memory analysis.

Variants (cumulative structure, independently toggleable):
    fwd        eval-mode forward only
    fwd_loss   forward + geometric loss (eval step)
    full       the production train step
    no_s2d     train step with the space-to-depth conv path disabled
    no_splat   train step with the matmul-splat loss backward disabled
    no_both    both disabled
    no_scan    train step with the scanned inception runs disabled
    scan_all   scanned runs at every resolution (incl. the 112x192
               _B,_B run the production gate excludes)

Usage: python tools/codesize_probe.py [--topology v5e:1x1]
           [--variants full,no_s2d,...]
Prints one JSON line per variant (stderr progress, stdout summary).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from topology_bench import abstract_inputs, build_topology  # noqa: E402

N_FRAMES, H, W, N_PAIRS = 244, 224, 384, 715


def make_engine(mesh, s2d: bool, splat: bool, scan_px: int = 4096):
    from consistent_depth_tpu.models import hourglass, layers
    from consistent_depth_tpu.models.mannequin_challenge import (
        MannequinChallengeModel,
    )
    from consistent_depth_tpu.ops import resample
    from consistent_depth_tpu.ops.losses import LossWeights
    from consistent_depth_tpu.training import (
        TrainingEngine, create_optimizer,
    )

    layers.set_s2d_enabled(s2d)
    hourglass.set_scan_repeated_blocks(scan_px > 0)
    hourglass.SCAN_MAX_PIXELS = scan_px if scan_px > 0 else 4096
    engine = TrainingEngine(
        MannequinChallengeModel(checkpoint="", seed=0),
        create_optimizer("Adam", 4e-4),
        LossWeights(lambda_view_baseline=0.1, lambda_reprojection=1.0),
        mesh=mesh, precision="bf16")
    # engine construction re-enables splat under bf16; override after
    resample.set_splat_enabled(splat)
    return engine


def analyze(compiled, dt):
    ma = compiled.memory_analysis()
    return {
        "compile_s": round(dt, 1),
        "code_mib": round(ma.generated_code_size_in_bytes / 1024**2, 1),
        "temp_gib": round(ma.temp_size_in_bytes / 1024**3, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    # v5e:2x2 is the smallest valid v5e topology (1x1 violates the
    # default 2x2x1 chips_per_host_bounds)
    ap.add_argument("--topology", default="v5e:2x2")
    ap.add_argument("--variants",
                    default="fwd,fwd_loss,full,no_s2d,no_splat,no_both")
    ap.add_argument("--dump-hlo", default="")
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    topo = build_topology(args.topology)
    devices = np.asarray(topo.devices)
    n_chips = devices.size
    from consistent_depth_tpu.parallel.mesh import DATA_AXIS

    mesh = Mesh(devices, (DATA_AXIS,)) if n_chips > 1 else None

    batch = 4 * n_chips
    report = {}
    for variant in args.variants.split(","):
        s2d = variant not in ("no_s2d", "no_both")
        splat = variant not in ("no_splat", "no_both")
        scan_px = {"no_scan": 0, "scan_all": 1 << 62}.get(variant, 4096)
        engine = make_engine(mesh, s2d=s2d, splat=splat, scan_px=scan_px)
        state, data, idx, valid, cap = abstract_inputs(
            engine, n_chips, N_FRAMES, H, W, N_PAIRS,
            steps=int(np.ceil(N_PAIRS / batch)))
        bidx = jax.ShapeDtypeStruct((batch,), jnp.int32)
        bval = jax.ShapeDtypeStruct((batch,), jnp.float32)
        if variant == "fwd":
            fn = jax.jit(lambda s, d: engine._forward(
                s.params, s.batch_stats,
                d["frames"][d["pair_slots"][:batch]], None, True)[0])
            lowered = fn.lower(state, data)
        elif variant == "fwd_loss":
            lowered = jax.jit(engine._eval_step_impl).lower(
                state, data, bidx, bval)
        else:
            lowered = engine._train_step.lower(state, data, bidx, bval)
        t0 = time.perf_counter()
        compiled = lowered.compile()
        row = analyze(compiled, time.perf_counter() - t0)
        row["s2d"], row["splat"], row["scan_px"] = s2d, splat, scan_px
        report[variant] = row
        print(f"[probe] {variant}: {json.dumps(row)}", file=sys.stderr)
        if args.dump_hlo:
            os.makedirs(args.dump_hlo, exist_ok=True)
            with open(os.path.join(
                    args.dump_hlo, f"{variant}.hlo"), "w") as f:
                f.write(compiled.as_text())

    print(json.dumps({"topology": args.topology, "variants": report},
                     indent=1))


if __name__ == "__main__":
    main()
