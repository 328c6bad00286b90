"""Per-op TPU codegen-size probe: which op class carries the train
step's ~300 MiB of generated code (TOPOLOGY_v5e8.json; round-3 VERDICT
weak #2)?

tools/codesize_probe.py established the HLO graph is normal-sized
(~300 convs, ~1.4k fusions) and neither s2d nor the matmul splat is the
cause — so the bytes are per-op CODEGEN. This tool AOT-compiles tiny
programs on a device-less v5e topology and reads the compiler's own
generated-code size:

  conv fwd / grad-input / grad-weight at representative hourglass
  shapes (native and s2d variants), each compiled standalone with the
  engine's data-parallel sharding, plus an empty-but-sharded baseline
  to subtract the executable's fixed overhead.

Usage: python tools/convgrad_codesize.py [--topology v5e:2x2]
Prints one JSON line per program.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from topology_bench import build_topology  # noqa: E402

# (tag, H, W, C_in, k, C_out): one per distinct conv class in the
# hourglass (see tools/mxu_bench.py for the full table)
SHAPES = [
    ("stem7", 224, 384, 3, 7, 128),
    ("A.7", 224, 384, 64, 7, 16),
    ("A.3", 224, 384, 64, 3, 16),
    ("B.7", 112, 192, 32, 7, 32),
    ("BC.mid1x1", 112, 192, 256, 1, 64),
    ("E14.7", 14, 24, 32, 7, 64),
    ("pred3", 224, 384, 64, 3, 1),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x2")
    ap.add_argument("--per_chip_batch", type=int, default=8)
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    topo = build_topology(args.topology)
    devices = np.asarray(topo.devices)
    mesh = Mesh(devices, ("data",))
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P("data"))
    B = args.per_chip_batch * devices.size

    from consistent_depth_tpu.models import layers

    layers.set_compute_dtype(jnp.bfloat16)

    def compile_one(fn, x_sds, w_sds, grad_of=None):
        if grad_of is not None:
            base = fn
            fn = jax.grad(
                lambda w, x: base(w, x).astype(jnp.float32).sum(),
                argnums=grad_of)
        jitted = jax.jit(fn, in_shardings=(repl, batched),
                         out_shardings=repl if grad_of == 0 else batched)
        t0 = time.perf_counter()
        compiled = jitted.lower(w_sds, x_sds).compile()
        dt = time.perf_counter() - t0
        ma = compiled.memory_analysis()
        return {"compile_s": round(dt, 1),
                "code_mib": round(
                    ma.generated_code_size_in_bytes / 1024**2, 2)}

    # fixed executable overhead baseline: a sharded elementwise op
    x0 = jax.ShapeDtypeStruct((B, 8, 8, 8), jnp.float32)
    w0 = jax.ShapeDtypeStruct((8,), jnp.float32)
    base = compile_one(lambda w, x: x * w, x0, w0)
    print(json.dumps({"tag": "baseline_elementwise", **base}), flush=True)

    for tag, H, W, C_in, k, C_out in SHAPES:
        x_sds = jax.ShapeDtypeStruct((B, H, W, C_in), jnp.float32)
        w_sds = jax.ShapeDtypeStruct((k, k, C_in, C_out), jnp.float32)
        for s2d_on in (False, True):
            s = (layers._s2d_factor(H, W, C_in, k, C_out)
                 if s2d_on else 0)
            if s2d_on and not s:
                continue

            def conv(w, x, _s2d=s2d_on):
                layers.set_s2d_enabled(_s2d)
                return layers.conv_compute(
                    w, None, x, stride=1, padding=(k - 1) // 2)

            variant = f"s2d{s}" if s2d_on else "native"
            for direction, grad_of in (("fwd", None), ("gx", 1),
                                       ("gw", 0)):
                row = compile_one(conv, x_sds, w_sds, grad_of)
                print(json.dumps({
                    "tag": tag, "variant": variant, "dir": direction,
                    **row}), flush=True)


if __name__ == "__main__":
    main()
