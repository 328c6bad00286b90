"""CLI flag surface: defaults, kitti preset, model-default resolution
(reference: params.py:97-123)."""

from consistent_depth_tpu.cli.params import Video3dParamsParser


def test_defaults_resolve_from_model():
    p = Video3dParamsParser().parse(["--path", "x"])
    assert p.model_type == "mc"
    assert p.align == 16
    assert p.learning_rate == 0.0004
    assert p.lambda_view_baseline == 0.1
    assert p.flow_ops == ["hierarchical2"]
    assert p.overlap_ratio == 0.2
    assert p.batch_size == 4 and p.num_epochs == 20


def test_kitti_preset():
    p = Video3dParamsParser().parse(["--path", "x", "--configure", "kitti"])
    assert p.model_type == "monodepth2"
    assert p.flow_checkpoint == "FlowNet2-KITTI"
    assert p.overlap_ratio == 0.5
    assert p.matcher == "sequential"
    assert p.align == 1
    assert p.learning_rate == 0.00004
    assert p.lambda_view_baseline == 1


def test_explicit_overrides_win():
    p = Video3dParamsParser().parse([
        "--path", "x", "--learning_rate", "0.01",
        "--lambda_view_baseline", "0.5", "--align", "8"])
    assert p.learning_rate == 0.01
    assert p.lambda_view_baseline == 0.5
    assert p.align == 8


def test_frame_range_flag():
    p = Video3dParamsParser().parse(["--path", "x",
                                     "--frame_range", "0,5-7"])
    assert p.frame_range.name == "0,5-7"
    assert p.frame_range.set.set == {0, 5, 6, 7}
