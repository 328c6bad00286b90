import pytest

from consistent_depth_tpu.utils.frame_range import (
    FrameRange, OptionalSet, parse_frame_range,
)


def test_parse_canonical_name():
    parsed = parse_frame_range("6,6,5,8,0,2-4,5-6,10,9")
    assert parsed.name == "0,2-6,8-10"
    assert parsed.set.set == {0, 2, 3, 4, 5, 6, 8, 9, 10}


def test_parse_empty_is_unconstrained():
    parsed = parse_frame_range("")
    assert parsed.name == ""
    assert parsed.set.set is None


def test_parse_rejects_negative():
    with pytest.raises(ValueError):
        parse_frame_range("-3-2")


def test_frame_range_intersection():
    fr = FrameRange(parse_frame_range("0,2-10,21-40").set, num_frames=30)
    assert fr.frames() == [0] + list(range(2, 11)) + list(range(21, 30))
    sub = fr.intersection(OptionalSet({5, 6, 7, 100}))
    assert sub.frames() == [5, 6, 7]
    assert sub.index_to_frame == {0: 5, 1: 6, 2: 7}


def test_matches_reference(reference_root):
    from utils import frame_range as ref

    for s in ["", "0,2-10,21-40", "3", "1-2,2-3"]:
        ours, theirs = parse_frame_range(s), ref.parse_frame_range(s)
        assert ours.name == theirs.name
        assert ours.set.set == theirs.set.set
