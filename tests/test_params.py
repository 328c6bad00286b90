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


def test_flag_surface_matches_reference(reference_root):
    """Every reference CLI flag must exist here with an identical
    default (reference params.py:20-95 composes each stage's
    add_arguments). Ours may only ADD flags, and each addition must be
    on the documented beyond-reference list.

    The reference parser is imported with its unavailable externals
    stubbed (git submodules and download helpers are not in this
    image); the stubs only satisfy module imports — the argparse
    surface under test is entirely the reference's own code.
    """
    import sys
    import types

    inserted = []

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for key, value in attrs.items():
            setattr(mod, key, value)
        if name not in sys.modules:
            sys.modules[name] = mod
            inserted.append(name)
        return sys.modules[name]

    stub("wget")
    tv = stub("torchvision")
    tv.utils = stub("torchvision.utils")
    stub("monodepth.mannequin_challenge")
    stub("monodepth.mannequin_challenge.models", pix2pix_model=object())
    stub("monodepth.mannequin_challenge.options")
    stub("monodepth.mannequin_challenge.options.train_options",
         TrainOptions=object)
    stub("monodepth.midas_v2")
    stub("monodepth.midas_v2.midas_net", MidasNet=object)
    stub("monodepth.monodepth2")
    stub("monodepth.monodepth2.networks")
    stub("monodepth.monodepth2.networks.resnet_encoder",
         ResnetEncoder=object)
    stub("monodepth.monodepth2.networks.depth_decoder", DepthDecoder=object)
    stub("third_party")
    stub("third_party.colmap")
    stub("third_party.colmap.scripts")
    stub("third_party.colmap.scripts.python")
    none = lambda *a, **k: None  # noqa: E731
    stub("third_party.colmap.scripts.python.read_write_model",
         CAMERA_MODELS=(), rotmat2qvec=none, Camera=object,
         BaseImage=object, write_model=none, qvec2rotmat=none,
         read_images_binary=none, read_points3d_binary=none,
         read_cameras_binary=none, read_model=none)
    stub("third_party.colmap.scripts.python.read_dense", read_array=none)

    try:
        import params as ref_params  # the reference's params.py

        def flag_defaults(parser):
            return {
                action.option_strings[0]: action.default
                for action in parser._actions
                if action.option_strings and action.option_strings[0] != "-h"
            }

        ref = ref_params.Video3dParamsParser()
        ref.initialize()
        ref_flags = flag_defaults(ref.parser)
    finally:
        # don't leak empty stub modules into the rest of the pytest
        # session (they would shadow real packages for later tests)
        for name in inserted:
            sys.modules.pop(name, None)

    our_flags = flag_defaults(Video3dParamsParser().parser)

    missing = sorted(set(ref_flags) - set(our_flags))
    assert not missing, f"reference flags absent here: {missing}"
    mismatched = {
        flag: (ref_flags[flag], our_flags[flag])
        for flag in ref_flags if our_flags[flag] != ref_flags[flag]
    }
    assert not mismatched, f"defaults differ (ref, ours): {mismatched}"

    beyond_reference = {"--precision", "--profile_dir", "--resume",
                        "--colmap_keep_going"}
    extras = set(our_flags) - set(ref_flags)
    assert extras <= beyond_reference, (
        f"undocumented extra flags: {sorted(extras - beyond_reference)}")
