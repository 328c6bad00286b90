"""Measure multi-video serving throughput on the real chip.

Streams N synthetic videos at the production depth resolution through
:class:`consistent_depth_tpu.serving.DepthServer` and reports
frames/sec for a few batch sizes (eval-mode forward only — the serving
path). Double-buffered dispatch means the steady-state rate is set by
device compute, not the host fetch.

Usage: python tools/serve_bench.py [--frames 64] [--size 224 384]
"""

import argparse
import json
import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64,
                    help="frames per video (2 videos are interleaved)")
    ap.add_argument("--size", type=int, nargs=2, default=(224, 384))
    ap.add_argument("--batch-sizes", type=int, nargs="*",
                    default=(4, 8, 16))
    ap.add_argument("--precision", default="bf16")
    args = ap.parse_args()

    from consistent_depth_tpu.serving import DepthServer, ServeConfig

    H, W = args.size
    rng = np.random.default_rng(0)
    videos = {
        "a": np.asarray(rng.random((args.frames, H, W, 3)), np.float32),
        "b": np.asarray(rng.random((args.frames, H, W, 3)), np.float32),
    }
    n_total = 2 * args.frames

    for bs in args.batch_sizes:
        server = DepthServer(ServeConfig(
            model_type="mc", checkpoint="", precision=args.precision,
            batch_size=bs))
        server.infer_videos(videos)          # warm up / compile
        t0 = time.perf_counter()
        out = server.infer_videos(videos)
        dt = time.perf_counter() - t0
        assert all(np.isfinite(v).all() for v in out.values())
        print(json.dumps({
            "batch_size": bs, "frames": n_total, "size": [H, W],
            "precision": args.precision,
            "fps": round(n_total / dt, 1),
            "ms_per_frame": round(1e3 * dt / n_total, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
