"""Stage-graph framework: probe-based skipping, ordering, introspection
(reference resumability model: every stage is skipped when its outputs
already exist — process.py:38-99 via the per-stage check_* helpers)."""

import os
from os.path import join as pjoin

import numpy as np

from consistent_depth_tpu.cli.params import Video3dParamsParser
from consistent_depth_tpu.io import image_io
from consistent_depth_tpu.pipeline.process import (
    DatasetProcessor,
    PipelineState,
    Stage,
)
from consistent_depth_tpu.pipeline.video import Video


def _params(path):
    return Video3dParamsParser().parse(["--path", path, "--model_type", "mc"])


def test_stage_execute_skips_when_done():
    calls = []
    st = Stage("x", run=lambda s: calls.append("run"),
               done=lambda s: True)
    st.execute(PipelineState(params=None))
    assert calls == []

    st2 = Stage("y", run=lambda s: calls.append("run"),
                done=lambda s: False)
    st2.execute(PipelineState(params=None))
    assert calls == ["run"]


def test_stage_disabled_never_probes():
    st = Stage("z", run=lambda s: 1 / 0, done=lambda s: 1 / 0,
               enabled=lambda s: False)
    st.execute(PipelineState(params=None))  # no ZeroDivisionError


def test_describe_lists_stages_in_order(tmp_path):
    names = DatasetProcessor().describe(_params(str(tmp_path)))
    assert names[:2] == ["Extracting PTS", "Extracting frames"]
    assert names.index("Calibrating scale") < names.index("Compute flow")
    assert names.index("Fine-tuning") < names.index("Compute final depth")
    assert names[-1] == "Export visualization videos"


def test_video_stage_probes_fire_on_existing_artifacts(tmp_path):
    """The frames/downscale stages' ``done`` probes must report complete
    on a pre-populated dataset dir (what lets the pipeline resume past
    them without ffmpeg, as the e2e test and the reference's precomputed
    demo rely on)."""
    import cv2

    path = str(tmp_path)
    N, H, W = 3, 16, 24
    with open(pjoin(path, "frames.txt"), "w") as f:
        f.write(f"{N}\n{W}\n{H}\n" + "".join(f"{i/30:.6f}\n" for i in range(N)))
    for sub in ("color_full", "color_down_png", "color_flow"):
        os.makedirs(pjoin(path, sub))
    os.makedirs(pjoin(path, "color_down"))
    rng = np.random.default_rng(0)
    for i in range(N):
        im = rng.random((H, W, 3)).astype(np.float32)
        for sub in ("color_full", "color_down_png", "color_flow"):
            cv2.imwrite(pjoin(path, sub, f"frame_{i:06d}.png"),
                        (im * 255).astype(np.uint8))
        image_io.save_raw_float32_image(
            pjoin(path, "color_down", f"frame_{i:06d}.raw"), im)

    proc = DatasetProcessor()
    graph = proc._build_graph(_params(path))
    state = PipelineState(params=_params(path), path=path,
                          video=Video(path))
    by_name = {st.name: st for st in graph}
    assert by_name["Extracting PTS"].done(state)       # sets frame_count
    assert state.video.frame_count == N
    for name in ("Extracting frames", "Downscaling frames (raw)",
                 "Downscaling frames (png)",
                 "Downscaling frames (for flow)"):
        assert by_name[name].done(state), name

    # filter-pairs probe: false until both flow_list files exist
    state.out_dir = pjoin(path, "out")
    os.makedirs(state.out_dir)
    filt = by_name["Filter flow pairs"]
    assert not filt.done(state)
    overlap = state.params.overlap_ratio
    open(pjoin(state.out_dir, "flow_list_%.2f.json" % overlap), "w").close()
    assert not filt.done(state)
    open(pjoin(path, "flow_list.json"), "w").close()
    assert filt.done(state)
