"""MEASURED end-to-end demo run at reference-demo scale.

Builds a geometrically exact synthetic dataset shaped like the ayush
demo (244 frames, 224x384, hierarchical2 pairs — reference README.md's
37-min configuration) with precomputed video/COLMAP stages, then drives
the real CLI pipeline (flow masks -> scale calibration -> 20-epoch
fine-tune -> depth export) on the attached TPU and reports per-stage
wall-clock. This turns bench.py's *projection* into a measured number.

Usage:
    python tools/demo_run.py [--path DIR] [--frames 244] [--epochs 20]
                             [--precision bf16]
"""

import argparse
import json
import os
import sys
import time
from os.path import join as pjoin

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, pjoin(_repo, "tests"))

import numpy as np


def build_dataset(path: str, num_frames: int, H: int, W: int,
                  write_flow: bool = True):
    """Reference-layout dataset dir with video + COLMAP stage outputs
    pre-populated (the demo's precomputed-COLMAP configuration) and
    exact flows for every two-way hierarchical2 pair."""
    import cv2

    import synthetic
    from consistent_depth_tpu.io import image_io, metadata_io
    from consistent_depth_tpu.utils import frame_range, frame_sampling

    t0 = time.perf_counter()
    scene = synthetic.make_scene(num_frames=num_frames, H=H, W=W)

    metadata_io.write_frames_txt(
        pjoin(path, "frames.txt"),
        metadata_io.FramesTxt(
            num_frames, W, H,
            [f"{i / 30:.6f}" for i in range(num_frames)]))
    for sub in ("color_full", "color_down_png", "color_flow",
                "color_down"):
        os.makedirs(pjoin(path, sub), exist_ok=True)
    for i in range(num_frames):
        bgr = (scene["frames"][i][..., ::-1] * 255).astype(np.uint8)
        for sub in ("color_full", "color_down_png", "color_flow"):
            cv2.imwrite(pjoin(path, sub, f"frame_{i:06d}.png"), bgr)
        image_io.save_raw_float32_image(
            pjoin(path, "color_down", f"frame_{i:06d}.raw"),
            scene["frames"][i])

    os.makedirs(pjoin(path, "colmap_dense"), exist_ok=True)
    metadata_io.write_metadata(
        pjoin(path, "colmap_dense", "metadata.npz"),
        scene["intrinsics"], scene["extrinsics"])
    conv_dir = pjoin(path, "depth_colmap_dense", "depth")
    os.makedirs(conv_dir, exist_ok=True)
    for i in range(num_frames):
        image_io.save_raw_float32_image(
            pjoin(conv_dir, f"frame_{i:06d}.raw"),
            (1.0 / scene["depths"][i]).astype(np.float32))

    os.makedirs(pjoin(path, "flow"), exist_ok=True)
    fr = frame_range.FrameRange(
        frame_range.OptionalSet(), num_frames=num_frames)
    pairs = frame_sampling.SamplePairs.sample(
        [frame_sampling.SamplePairsOptions(
            frame_sampling.SamplePairsMode.HIERARCHICAL2)],
        fr, two_way=True)
    if write_flow:
        for (i, j) in pairs:
            image_io.save_raw_float32_image(
                pjoin(path, "flow", f"flow_{i:06d}_{j:06d}.raw"),
                synthetic.exact_flow(scene, i, j))
    return time.perf_counter() - t0, len(pairs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default="/tmp/cdtpu_demo")
    ap.add_argument("--frames", type=int, default=244)
    ap.add_argument("--size", type=int, nargs=2, default=(224, 384))
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument(
        "--native_flow", action="store_true",
        help="do NOT pre-populate flow/ — the pipeline's Compute-flow "
        "stage drives the native FlowNet2 backend on the chip (the "
        "reference demo's FlowNet2 configuration; weights random-init "
        "in this offline env, so this measures TIMING, not flow "
        "quality — near-zero random flows keep every pair through the "
        "consistency filter)")
    args = ap.parse_args()

    # honor JAX_PLATFORMS=cpu (smoke runs) even though this
    # environment's sitecustomize boot hook force-selects the axon TPU
    # platform via a config update that overrides the env var
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        import jax
        jax.config.update("jax_platforms", "cpu")

    H, W = args.size
    os.makedirs(args.path, exist_ok=True)

    if args.native_flow:
        # Place a random-init full-FlowNet2 torch checkpoint in the
        # cache so the pipeline's Compute-flow stage takes the NATIVE
        # path end-to-end (discovery -> torch import -> JAX cascade —
        # the chain a user with the real flownet2.pth exercises).
        # Random weights time identically to real ones.
        ckpt_dir = os.environ.setdefault(
            "CDTPU_CHECKPOINT_DIR", pjoin(args.path, "checkpoints"))
        ckpt = pjoin(ckpt_dir, "flownet2.pth")
        if not os.path.isfile(ckpt):
            t0 = time.perf_counter()
            import jax
            import jax.numpy as jnp

            from consistent_depth_tpu.flow.flownet import FlowNet2
            from consistent_depth_tpu.models import torch_import

            z = jnp.zeros((1, 64, 64, 3))
            variables = jax.eval_shape(
                lambda: FlowNet2().init(jax.random.PRNGKey(0), z, z))
            variables = jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, s.dtype), variables)
            os.makedirs(ckpt_dir, exist_ok=True)
            torch_import.save_torch_checkpoint(ckpt, variables)
            print(json.dumps({
                "stage": "make_flownet2_ckpt",
                "s": round(time.perf_counter() - t0, 1)}), flush=True)

    if not os.path.isfile(pjoin(args.path, "frames.txt")):
        build_s, n_flows = build_dataset(
            args.path, args.frames, H, W,
            write_flow=not args.native_flow)
        print(json.dumps({"stage": "build_dataset", "s": round(build_s, 1),
                          "directed_flows": n_flows}), flush=True)
    else:
        print(json.dumps({"stage": "build_dataset", "s": 0.0,
                          "note": "cached"}), flush=True)

    from consistent_depth_tpu.cli.params import Video3dParamsParser
    from consistent_depth_tpu.pipeline.process import DatasetProcessor
    from consistent_depth_tpu.utils.jit_cache import (
        enable_persistent_jit_cache,
    )

    enable_persistent_jit_cache()

    params = Video3dParamsParser().parse([
        "--path", args.path,
        "--batch_size", str(args.batch_size),
        "--num_epochs", str(args.epochs),
        "--model_type", "mc",
        "--precision", args.precision,
    ])
    params.model_checkpoint = ""  # no pretrained weights in this env

    t0 = time.perf_counter()
    initial_depth_dir, ft_out_dir, frames = DatasetProcessor().process(params)
    total_s = time.perf_counter() - t0

    n_final = len(os.listdir(pjoin(ft_out_dir, "depth")))
    n_eval = len([f for f in os.listdir(pjoin(ft_out_dir, "eval"))
                  if f.endswith(".json")])
    print(json.dumps({
        "stage": "pipeline_total", "s": round(total_s, 1),
        "epochs": args.epochs, "frames": len(frames),
        "final_depth_files": n_final, "eval_loss_files": n_eval,
        "out_dir": ft_out_dir,
    }), flush=True)


if __name__ == "__main__":
    main()
