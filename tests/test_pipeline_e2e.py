"""End-to-end pipeline smoke test: the full `main.py`-equivalent CLI run
on a synthetic scene with precomputed COLMAP-style inputs (poses +
dense depth), exercising every stage except ffmpeg/colmap subprocesses
(video frames and SfM outputs are pre-populated, as in the reference's
demo with precomputed COLMAP — README.md:40-43).

Also the offline golden-artifact regression gate: every run's initial
depth, pre-training eval losses, scale calibration, and final artifacts
are diffed against goldens committed under ``tests/golden/e2e``
(regenerate with ``python tools/make_golden.py`` after an intentional
numerics change). This is the stand-in for the reference's
expected-results fixture (reference README.md:70-71) until real
pretrained weights are available in this environment.
"""

import json
import os
from os.path import join as pjoin

import numpy as np
import pytest

import synthetic
from consistent_depth_tpu.io import image_io, metadata_io

pytestmark = pytest.mark.slow  # compile-heavy

GOLDEN_DIR = pjoin(os.path.dirname(__file__), "golden", "e2e")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Synthetic dataset dir with everything the video/colmap stages
    would have produced."""
    path = str(tmp_path_factory.mktemp("e2e"))
    scene = synthetic.build_e2e_dataset(path)
    return path, scene


@pytest.fixture(scope="module")
def pipeline_run(dataset):
    """One full pipeline run shared by the structural and golden tests."""
    path, scene = dataset
    initial_depth_dir, ft_out_dir, frames = synthetic.run_e2e_pipeline(path)
    return path, scene, initial_depth_dir, ft_out_dir, frames


def test_full_pipeline(pipeline_run):
    path, scene, initial_depth_dir, ft_out_dir, frames = pipeline_run

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


def test_golden_parity(pipeline_run):
    """Diff this run's artifacts against the committed goldens.

    Tight bands on the training-free artifacts (initial depth inference,
    pre-training eval losses, calibration scales): these are
    deterministic forward passes where any drift means a numerics
    change. The post-training bands are MEASURED (tools/band_drift.py,
    2026-08-20, 3 subprocess runs on the recording backend): run-to-run
    drift on one host is bitwise ZERO (seeded + XLA:CPU deterministic),
    and the only historical source of vs-golden drift was an
    intentional numerics change (the round-4 backward-conv policy moved
    post-train eval losses 1.64e-3 rel / final depth 2.7e-4 RMSE while
    leaving every forward artifact identical). Bands are set ~30x that
    scale to absorb cross-host XLA:CPU codegen variation; anything
    bigger than that IS an (intentional or not) numerics change and
    must come with regenerated goldens.
    """
    import sys

    sys.path.insert(0, pjoin(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import compare_artifacts as ca

    if not os.path.isdir(GOLDEN_DIR):
        pytest.fail(
            "tests/golden/e2e is missing — regenerate with "
            "`python tools/make_golden.py` and commit the result")

    path, scene, initial_depth_dir, ft_out_dir, frames = pipeline_run
    range_dir = os.path.dirname(ft_out_dir)

    with open(pjoin(GOLDEN_DIR, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["pipeline_args"] == synthetic.E2E_PIPELINE_ARGS

    # 1. initial depth inference (pure forward, random-init params)
    d = ca.compare_depth_dirs(
        pjoin(GOLDEN_DIR, "initial_depth"), pjoin(initial_depth_dir, "depth"))
    assert d["frames_compared"] == 6 and not d["frames_only_a"]
    assert d["rmse_max"] < 1e-3, f"initial depth drifted: {d}"

    # 2. calibration scales
    golden_scales = metadata_io.read_scales_csv(
        pjoin(GOLDEN_DIR, "scales.csv"))
    scales = metadata_io.read_scales_csv(pjoin(range_dir, "scales.csv"))
    np.testing.assert_allclose(
        scales[:, 1], golden_scales[:, 1], rtol=1e-3)

    # 3. eval losses: pre-training tight, post-training loose
    e = ca.compare_eval_losses(
        pjoin(GOLDEN_DIR, "eval"), pjoin(ft_out_dir, "eval"))
    assert e, "no overlapping eval loss files vs golden"
    pre = [n for n in e if "_e0000_" in n or n == "loss_e0000.json"]
    assert pre, f"pre-training eval missing from comparison: {list(e)}"
    for name in e:
        # post-train band: measured drift is 0 run-to-run and was
        # 1.64e-3 across the one intentional backward-numerics change
        # (see docstring) — 0.05 = ~30x margin
        band = 1e-3 if name in pre else 0.05
        for key, v in e[name].items():
            assert v["rel_diff"] < band, (
                f"eval {name} {key} out of band: {v}")

    # 4. final depth: measured drift 0 run-to-run / 2.7e-4 across the
    # round-4 backward-policy change — 0.02 = ~74x margin
    d = ca.compare_depth_dirs(
        pjoin(GOLDEN_DIR, "final_depth"), pjoin(ft_out_dir, "depth"))
    assert d["frames_compared"] == 6
    assert d["rmse_max"] < 0.02, f"final depth out of band: {d}"


def test_pipeline_is_idempotent(pipeline_run):
    """Re-running the pipeline must skip every cached stage quickly
    (the reference's resumability model, SURVEY §5)."""
    import time

    path = pipeline_run[0]
    t0 = time.perf_counter()
    synthetic.run_e2e_pipeline(path)
    # the only non-cached stages are fine-tune + final depth checks;
    # everything before fine-tuning must be skipped via cache checks
    assert os.path.isfile(pjoin(path, "flow_list.json"))
    assert time.perf_counter() - t0 < 600
