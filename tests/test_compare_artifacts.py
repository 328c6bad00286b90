"""The accuracy-parity harness must deliver correct verdicts (self-check
on synthetic depth dirs; the real-weights run needs the released
checkpoints, tools/compare_artifacts.py --fetch-checkpoints)."""

import json
import os
import sys
from os.path import join as pjoin

import numpy as np

from consistent_depth_tpu.io import image_io

sys.path.insert(0, pjoin(os.path.dirname(__file__), "..", "tools"))
import compare_artifacts  # noqa: E402


def _write_depths(d, frames, noise=0.0, seed=0):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    base = np.random.default_rng(42)
    for i in frames:
        depth = base.random((16, 24)).astype(np.float32) + 0.5
        depth = depth + noise * rng.standard_normal(depth.shape).astype(
            np.float32)
        image_io.save_raw_float32_image(
            pjoin(d, f"frame_{i:06d}.raw"), depth)


def test_identical_dirs_pass(tmp_path, capsys):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _write_depths(a, range(3))
    _write_depths(b, range(3))
    assert compare_artifacts.main([a, b]) == 0
    out = capsys.readouterr().out
    assert "VERDICT: PASS" in out


def test_out_of_band_fails(tmp_path, capsys):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _write_depths(a, range(3))
    _write_depths(b, range(3), noise=0.3, seed=7)
    assert compare_artifacts.main([a, b]) == 1
    assert "VERDICT: FAIL" in capsys.readouterr().out


def test_small_noise_within_band(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _write_depths(a, range(3))
    _write_depths(b, range(3), noise=1e-4, seed=7)
    assert compare_artifacts.main([a, b]) == 0


def test_eval_loss_diff(tmp_path, capsys):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for d, rep in ((a, 0.5), (b, 0.505)):
        os.makedirs(pjoin(d, "eval"))
        with open(pjoin(d, "eval", "loss_e0000_iter000000.json"), "w") as f:
            json.dump({"mean": {"reprojection": rep, "disparity": 0.1}}, f)
    assert compare_artifacts.main([a, b]) == 0
    out = capsys.readouterr().out
    assert "reprojection" in out and "rel_diff" in out


def test_skip_is_distinct_exit_code(tmp_path, capsys):
    """No comparable artifacts must NOT read as parity: exit 2, so a CI
    wiring that calls the harness can't silently pass on missing inputs."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(a), os.makedirs(b)
    assert compare_artifacts.main([a, b]) == 2
    assert "SKIP" in capsys.readouterr().out


def test_nan_pixels_ignored(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(a), os.makedirs(b)
    x = np.ones((8, 8), np.float32)
    x_nan = x.copy()
    x_nan[0, 0] = np.nan
    image_io.save_raw_float32_image(pjoin(a, "frame_000000.raw"), x)
    image_io.save_raw_float32_image(pjoin(b, "frame_000000.raw"), x_nan)
    rep = compare_artifacts.compare_depth_dirs(a, b)
    assert rep["rmse_mean"] == 0.0
