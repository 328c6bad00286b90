"""End-to-end pipeline smoke test: the full `main.py`-equivalent CLI run
on a synthetic scene with precomputed COLMAP-style inputs (poses +
dense depth), exercising every stage except ffmpeg/colmap subprocesses
(video frames and SfM outputs are pre-populated, as in the reference's
demo with precomputed COLMAP — README.md:40-43)."""

import json
import os
from os.path import join as pjoin

import numpy as np
import pytest

import synthetic
from consistent_depth_tpu.io import image_io, metadata_io

pytestmark = pytest.mark.slow  # compile-heavy


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Synthetic dataset dir with everything the video/colmap stages
    would have produced."""
    import cv2

    path = str(tmp_path_factory.mktemp("e2e"))
    N, H, W = 6, 32, 48
    scene = synthetic.make_scene(num_frames=N, H=H, W=W)

    # video stage outputs: frames.txt + color_full + downscaled dirs
    metadata_io.write_frames_txt(
        pjoin(path, "frames.txt"),
        metadata_io.FramesTxt(N, W, H, [f"{i / 30:.6f}" for i in range(N)]))
    for sub in ("color_full", "color_down_png", "color_flow"):
        os.makedirs(pjoin(path, sub), exist_ok=True)
    os.makedirs(pjoin(path, "color_down"), exist_ok=True)
    for i in range(N):
        bgr = (scene["frames"][i][..., ::-1] * 255).astype(np.uint8)
        for sub in ("color_full", "color_down_png", "color_flow"):
            cv2.imwrite(pjoin(path, sub, f"frame_{i:06d}.png"), bgr)
        image_io.save_raw_float32_image(
            pjoin(path, "color_down", f"frame_{i:06d}.raw"),
            scene["frames"][i])

    # colmap stage outputs: poses metadata + converted dense inverse depth
    os.makedirs(pjoin(path, "colmap_dense"), exist_ok=True)
    metadata_io.write_metadata(
        pjoin(path, "colmap_dense", "metadata.npz"),
        scene["intrinsics"], scene["extrinsics"])
    conv_dir = pjoin(path, "depth_colmap_dense", "depth")
    os.makedirs(conv_dir, exist_ok=True)
    for i in range(N):
        image_io.save_raw_float32_image(
            pjoin(conv_dir, f"frame_{i:06d}.raw"),
            (1.0 / scene["depths"][i]).astype(np.float32))

    # flow stage inputs: exact flow for every two-way hierarchical2 pair
    os.makedirs(pjoin(path, "flow"), exist_ok=True)
    from consistent_depth_tpu.utils import frame_range, frame_sampling

    fr = frame_range.FrameRange(frame_range.OptionalSet(), num_frames=N)
    pairs = frame_sampling.SamplePairs.sample(
        [frame_sampling.SamplePairsOptions(
            frame_sampling.SamplePairsMode.HIERARCHICAL2)],
        fr, two_way=True)
    for (i, j) in pairs:
        image_io.save_raw_float32_image(
            pjoin(path, "flow", f"flow_{i:06d}_{j:06d}.raw"),
            synthetic.exact_flow(scene, i, j))

    return path, scene


def test_full_pipeline(dataset):
    path, scene = dataset
    from consistent_depth_tpu.cli.params import Video3dParamsParser
    from consistent_depth_tpu.pipeline.process import DatasetProcessor

    params = Video3dParamsParser().parse([
        "--path", path,
        "--batch_size", "2",
        "--num_epochs", "2",
        "--model_type", "mc",
    ])
    params.model_checkpoint = ""  # no pretrained weights in this env
    initial_depth_dir, ft_out_dir, frames = DatasetProcessor().process(params)

    assert frames == list(range(6))
    # initial + final depth written for every frame
    for i in frames:
        assert os.path.isfile(
            pjoin(initial_depth_dir, "depth", f"frame_{i:06d}.raw"))
        assert os.path.isfile(pjoin(ft_out_dir, "depth", f"frame_{i:06d}.raw"))

    # output-tree tag contract (reference: process.py:22-29 +
    # depth_fine_tuning.py:130-136)
    assert "R_hierarchical2_mc" in ft_out_dir
    assert os.path.basename(ft_out_dir) == "B0.1_R1.0_PL1-0_LR0.0004_BS2_Oadam"

    # scale calibration artifacts
    range_dir = os.path.dirname(ft_out_dir)
    scales = metadata_io.read_scales_csv(pjoin(range_dir, "scales.csv"))
    assert scales.shape[0] == 6
    meta = metadata_io.read_metadata(pjoin(range_dir, "metadata_scaled.npz"))
    assert set(meta) == {"intrinsics", "extrinsics", "scales"}

    # flow masks + filtered pair list
    assert os.path.isfile(pjoin(path, "flow_list.json"))
    flow_list = metadata_io.read_flow_list(pjoin(path, "flow_list.json"))
    assert len(flow_list) > 0

    # fine-tune artifacts: checkpoint + eval losses
    assert os.path.isfile(pjoin(ft_out_dir, "checkpoints", "0001.pth"))
    assert os.path.isfile(pjoin(ft_out_dir, "checkpoints", "0002.pth"))
    eval_files = [f for f in os.listdir(pjoin(ft_out_dir, "eval"))
                  if f.startswith("loss") and f.endswith(".json")]
    assert len(eval_files) == 3  # pre-training + epochs 1, 2
    # (2 epochs also exercise the dispatch-ahead loop's donation
    # hazard: a checkpoint snapshot must survive the next epoch's
    # donated train dispatch)
    with open(pjoin(ft_out_dir, "eval", sorted(eval_files)[0])) as f:
        losses = json.load(f)
    assert {"reprojection", "disparity", "mean"} <= set(losses)

    # debug visualizations
    assert len(os.listdir(pjoin(path, "vis_flow"))) > 0
    assert len(os.listdir(pjoin(path, "vis_flow_warped"))) > 0
    assert len(os.listdir(pjoin(range_dir, "vis_calibration_dense"))) > 0


def test_pipeline_is_idempotent(dataset):
    """Re-running the pipeline must skip every cached stage quickly
    (the reference's resumability model, SURVEY §5)."""
    import time

    path, scene = dataset
    from consistent_depth_tpu.cli.params import Video3dParamsParser
    from consistent_depth_tpu.pipeline.process import DatasetProcessor

    params = Video3dParamsParser().parse([
        "--path", path, "--batch_size", "2", "--num_epochs", "2",
        "--model_type", "mc",
    ])
    params.model_checkpoint = ""
    t0 = time.perf_counter()
    DatasetProcessor().process(params)
    # the only non-cached stages are fine-tune + final depth checks;
    # everything before fine-tuning must be skipped via cache checks
    assert os.path.isfile(pjoin(path, "flow_list.json"))
    assert time.perf_counter() - t0 < 600
