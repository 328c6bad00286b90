"""Pair sampler semantics must match the reference exactly — the pair
set defines the training distribution."""

import pytest

from consistent_depth_tpu.utils import frame_range, frame_sampling


def _ours(num_frames, mode, two_way):
    fr = frame_range.FrameRange(
        frame_range.OptionalSet(), num_frames=num_frames)
    opts = [frame_sampling.SamplePairsOptions(
        mode=frame_sampling.SamplePairsMode.name_mode_map()[mode])]
    return frame_sampling.SamplePairs.sample(opts, fr, two_way=two_way)


def _theirs(num_frames, mode, two_way, reference_root):
    from utils import frame_range as ref_fr
    from utils import frame_sampling as ref_fs

    fr = ref_fr.FrameRange(ref_fr.OptionalSet(), num_frames=num_frames)
    opts = [ref_fs.SamplePairsOptions(
        mode=ref_fs.SamplePairsMode.name_mode_map()[mode])]
    return ref_fs.SamplePairs.sample(opts, fr, two_way=two_way)


@pytest.mark.parametrize("mode", ["consecutive", "hierarchical",
                                  "hierarchical2"])
@pytest.mark.parametrize("num_frames", [2, 3, 17, 92, 244])
@pytest.mark.parametrize("two_way", [False, True])
def test_pairs_match_reference(mode, num_frames, two_way, reference_root):
    # note: the reference's "exhausted" mode cannot be compared — its
    # sample_exhausted is a staticmethod whose first arg is named `cls`,
    # so every call raises TypeError (reference utils/frame_sampling.py:127)
    ours = {(p[0], p[1]) for p in _ours(num_frames, mode, two_way)}
    theirs = {(p[0], p[1]) for p in _theirs(
        num_frames, mode, two_way, reference_root)}
    assert ours == theirs


def test_to_one_way_matches_reference(reference_root):
    from utils import frame_sampling as ref_fs

    pairs = _ours(30, "hierarchical2", True)
    ours = {tuple(p) for p in frame_sampling.SamplePairs.to_one_way(pairs)}
    theirs = {tuple(p) for p in ref_fs.SamplePairs.to_one_way(pairs)}
    assert ours == theirs
    assert all(a < b for a, b in ours)


def test_exhausted_semantics():
    one_way = {tuple(p) for p in _ours(5, "exhausted", False)}
    assert one_way == {(i, j) for i in range(5) for j in range(i + 1, 5)}
    two_way = {tuple(p) for p in _ours(4, "exhausted", True)}
    assert two_way == {(i, j) for i in range(4) for j in range(4) if i != j}


def test_hierarchical2_counts():
    # O(N log N): for N=244 the two-way hierarchical2 set stays small.
    pairs = _ours(244, "hierarchical2", True)
    assert 500 < len(pairs) < 3000
