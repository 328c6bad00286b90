"""COLMAPProcessor subprocess chain against a stub ``colmap`` binary.

No COLMAP binary exists in this image, so the full SfM/MVS chain
(reference: tools/colmap_processor.py:66-197) is exercised with a fake
executable that logs its argv and writes canned outputs. This covers
argument construction, command ordering, cache-skip logic, and the
sparse/dense completeness checks offline.
"""

import os
import stat
import sys
from os.path import join as pjoin

import numpy as np
import pytest

from consistent_depth_tpu.pipeline.colmap_processor import (
    COLMAPParams,
    COLMAPProcessor,
)

STUB = r"""#!/bin/bash
# Fake colmap: log argv, then fabricate the outputs each subcommand is
# expected to produce.
echo "$@" >> "$COLMAP_STUB_LOG"
cmd="$1"; shift
declare -A kv
while (( "$#" )); do kv["$1"]="$2"; shift 2; done
case "$cmd" in
  feature_extractor)
    touch "${kv[--database_path]}"
    ;;
  exhaustive_matcher|sequential_matcher)
    ;;
  mapper|point_triangulator)
    out="${kv[--output_path]}"
    # mapper writes model 0 into a subdir; point_triangulator writes
    # directly into the (already model-indexed) output dir
    if [ "$cmd" = mapper ]; then out="$out/0"; fi
    mkdir -p "$out"
    for f in cameras.bin images.bin points3D.bin; do touch "$out/$f"; done
    ;;
  image_undistorter)
    mkdir -p "${kv[--output_path]}/stereo/depth_maps"
    ;;
  patch_match_stereo)
    ws="${kv[--workspace_path]}"
    for img in "$COLMAP_STUB_IMAGES"/*; do
      touch "$ws/stereo/depth_maps/$(basename "$img").geometric.bin"
    done
    ;;
  *)
    echo "unknown colmap subcommand: $cmd" >&2
    exit 1
    ;;
esac
"""


@pytest.fixture
def stub_colmap(tmp_path, monkeypatch):
    """A fake colmap executable + an image dir; returns (bin, images, log)."""
    bin_path = str(tmp_path / "colmap_stub")
    with open(bin_path, "w") as f:
        f.write(STUB)
    os.chmod(bin_path, os.stat(bin_path).st_mode | stat.S_IEXEC)
    images = str(tmp_path / "images")
    os.makedirs(images)
    for i in range(3):
        with open(pjoin(images, f"frame_{i:06d}.png"), "wb") as f:
            f.write(b"\x89PNG")
    log = str(tmp_path / "stub.log")
    monkeypatch.setenv("COLMAP_STUB_LOG", log)
    monkeypatch.setenv("COLMAP_STUB_IMAGES", images)
    return bin_path, images, log


def _calls(log):
    if not os.path.isfile(log):
        return []
    with open(log) as f:
        return [line.split() for line in f if line.strip()]


def test_full_dense_chain(stub_colmap, tmp_path):
    bin_path, images, log = stub_colmap
    ws = str(tmp_path / "ws")
    args = COLMAPParams().parse_args(
        [images, ws, "--camera_params", "525,320,240",
         "--camera_model", "SIMPLE_PINHOLE", "--dense_max_size", "384"])
    args.colmap_bin_path = bin_path

    proc = COLMAPProcessor(bin_path)
    proc.process(args)

    calls = _calls(log)
    subcommands = [c[0] for c in calls]
    # the reference chain order (tools/colmap_processor.py:66-87):
    # features -> match -> mapper -> undistort -> patch-match
    assert subcommands == [
        "feature_extractor", "exhaustive_matcher", "mapper",
        "image_undistorter", "patch_match_stereo"]

    by_cmd = dict(zip(subcommands, calls))
    fe = by_cmd["feature_extractor"]
    assert fe[fe.index("--ImageReader.camera_params") + 1] == "525,320,240"
    assert fe[fe.index("--ImageReader.single_camera") + 1] == "1"
    mt = by_cmd["exhaustive_matcher"]
    assert mt[mt.index("--SiftMatching.guided_matching") + 1] == "1"
    mp = by_cmd["mapper"]
    # camera_params given without --refine_intrinsics -> intrinsics frozen
    assert mp[mp.index("--Mapper.ba_refine_focal_length") + 1] == "0"
    assert mp[mp.index("--Mapper.ba_refine_extra_params") + 1] == "0"
    pm = by_cmd["patch_match_stereo"]
    assert pm[pm.index("--PatchMatchStereo.max_image_size") + 1] == "384"

    # the stub's outputs must satisfy the driver's own checks
    assert proc.check_sparse(proc.sparse_dir(ws, 0))
    assert proc.check_dense(proc.dense_dir(ws, "0"), images)


def test_second_run_skips_cached_stages(stub_colmap, tmp_path):
    bin_path, images, log = stub_colmap
    ws = str(tmp_path / "ws")
    args = COLMAPParams().parse_args([images, ws])
    proc = COLMAPProcessor(bin_path)
    proc.process(args)
    n_first = len(_calls(log))
    proc.process(args)
    second = [c[0] for c in _calls(log)[n_first:]]
    # mapper and the dense pair are cached-skipped; extraction/matching
    # rerun (they are incremental in COLMAP itself) — reference behavior
    # (tools/colmap_processor.py:120-125, 171-176)
    assert second == ["feature_extractor", "exhaustive_matcher"]


def test_triangulate_path_with_pose_init(stub_colmap, tmp_path):
    bin_path, images, log = stub_colmap
    ws = str(tmp_path / "ws")
    pose_init = pjoin(ws, "pose_init")
    os.makedirs(pose_init)
    for f in ("cameras.txt", "images.txt", "points3D.txt"):
        open(pjoin(pose_init, f), "w").close()

    args = COLMAPParams().parse_args(
        [images, ws, "--initialize_pose", "--sparse",
         "--matcher", "sequential"])
    proc = COLMAPProcessor(bin_path)
    proc.process(args)

    calls = _calls(log)
    subcommands = [c[0] for c in calls]
    assert subcommands == [
        "feature_extractor", "sequential_matcher", "point_triangulator"]
    fe = calls[0]
    # pose-init mode pins SIFT to one deterministic thread (reference
    # tools/colmap_processor.py:100-105)
    assert fe[fe.index("--SiftExtraction.num_threads") + 1] == "1"
    sm = calls[1]
    assert sm[sm.index("--SequentialMatching.overlap") + 1] == "50"
    tr = calls[2]
    assert tr[tr.index("--input_path") + 1] == pose_init
    assert tr[tr.index("--Mapper.ba_refine_focal_length") + 1] == "0"
    # --sparse: no dense stage
    assert "image_undistorter" not in subcommands


def test_check_dense_ratio(stub_colmap, tmp_path):
    _, images, _ = stub_colmap
    dense = str(tmp_path / "dense")
    depth_dir = pjoin(dense, "stereo", "depth_maps")
    os.makedirs(depth_dir)
    names = sorted(os.listdir(images))
    # only 2 of 3 depth maps present
    for n in names[:2]:
        open(pjoin(depth_dir, n + ".geometric.bin"), "w").close()
    assert not COLMAPProcessor.check_dense(dense, images)
    assert COLMAPProcessor.check_dense(dense, images, valid_ratio=0.5)
    assert np.isclose(2 / 3, 0.666, atol=1e-2)  # sanity on the ratio


def test_standalone_cli(stub_colmap, tmp_path, monkeypatch):
    """The module is a standalone CLI like the reference's
    (tools/colmap_processor.py:263-264)."""
    bin_path, images, log = stub_colmap
    ws = str(tmp_path / "ws")
    from consistent_depth_tpu.pipeline import colmap_processor

    args = COLMAPParams().parse_args(
        [images, ws, "--sparse", "--colmap_bin_path", bin_path])
    assert colmap_processor.main(args) == 0
    assert [c[0] for c in _calls(log)] == [
        "feature_extractor", "exhaustive_matcher", "mapper"]


def test_fail_fast_raises_at_failing_subcommand(stub_colmap, tmp_path,
                                                monkeypatch):
    """Default: a nonzero COLMAP rc raises immediately, naming the
    subcommand and workspace (round-4 hardening; the reference logs and
    continues, tools/colmap_processor.py:248-250)."""
    bin_path, images, log = stub_colmap
    # the stub exits 1 on unknown subcommands; break the matcher name
    fail_bin = str(tmp_path / "colmap_fail")
    with open(bin_path) as f:
        body = f.read().replace("exhaustive_matcher|sequential_matcher)",
                                "never_matches)")
    with open(fail_bin, "w") as f:
        f.write(body)
    os.chmod(fail_bin, os.stat(fail_bin).st_mode | stat.S_IEXEC)

    ws = str(tmp_path / "ws")
    args = COLMAPParams().parse_args([images, ws, "--sparse"])
    with pytest.raises(RuntimeError) as exc:
        COLMAPProcessor(fail_bin).process(args)
    msg = str(exc.value)
    assert "exhaustive_matcher" in msg and ws in msg
    # nothing after the failing step ran
    assert [c[0] for c in _calls(log)] == [
        "feature_extractor", "exhaustive_matcher"]


def test_keep_going_matches_reference(stub_colmap, tmp_path):
    """--colmap_keep_going restores log-and-continue; the downstream
    missing-sparse-model error is then actionable (scale_calibration
    _read_colmap_poses)."""
    bin_path, images, log = stub_colmap
    fail_bin = str(tmp_path / "colmap_fail")
    with open(bin_path) as f:
        body = f.read().replace("mapper|point_triangulator)",
                                "never_matches)")
    with open(fail_bin, "w") as f:
        f.write(body)
    os.chmod(fail_bin, os.stat(fail_bin).st_mode | stat.S_IEXEC)

    ws = str(tmp_path / "ws")
    args = COLMAPParams().parse_args(
        [images, ws, "--sparse", "--colmap_keep_going"])
    proc = COLMAPProcessor(fail_bin, fail_fast=not args.colmap_keep_going)
    proc.process(args)  # mapper fails; driver keeps going (reference)
    assert not proc.check_sparse(proc.sparse_dir(ws, 0))

    from consistent_depth_tpu.pipeline.scale_calibration import (
        _read_colmap_poses,
    )
    with pytest.raises(FileNotFoundError) as exc:
        _read_colmap_poses(str(tmp_path), proc.sparse_dir(ws, 0))
    assert "sparse model" in str(exc.value)
