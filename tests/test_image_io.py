"""Golden tests for the .raw codec: round-trip with ourselves and
bit-exact compatibility with the reference implementation."""

import numpy as np
import pytest

from consistent_depth_tpu.io import image_io


@pytest.mark.parametrize("shape", [(7, 5), (13, 9, 1), (4, 6, 2), (8, 8, 3)])
def test_raw_roundtrip(tmp_path, shape):
    rng = np.random.default_rng(0)
    img = rng.standard_normal(shape).astype(np.float32)
    fn = str(tmp_path / "x.raw")
    image_io.save_raw_float32_image(fn, img)
    out = image_io.load_raw_float32_image(fn)
    expected = img.squeeze() if (len(shape) == 3 and shape[2] == 1) else img
    assert out.shape == expected.shape
    np.testing.assert_array_equal(out, expected)


def test_raw_header_layout(tmp_path):
    img = np.arange(12, dtype=np.float32).reshape(3, 2, 2)
    fn = str(tmp_path / "x.raw")
    image_io.save_raw_float32_image(fn, img)
    blob = open(fn, "rb").read()
    import struct
    h, w, cv_type, pixel_size = struct.unpack("<iiiQ", blob[:20])
    assert (h, w) == (3, 2)
    assert cv_type == 5 + ((2 - 1) << 3)
    assert pixel_size == 8
    payload = np.frombuffer(blob[20:], dtype=np.float32)
    np.testing.assert_array_equal(payload.reshape(3, 2, 2), img)


def test_raw_matches_reference_codec(tmp_path, reference_root):
    from utils import image_io as ref_io  # reference checkout, oracle only

    rng = np.random.default_rng(1)
    for shape in [(5, 4), (6, 3, 2), (4, 4, 3)]:
        img = rng.standard_normal(shape).astype(np.float32)
        ours, theirs = str(tmp_path / "a.raw"), str(tmp_path / "b.raw")
        image_io.save_raw_float32_image(ours, img)
        ref_io.save_raw_float32_image(theirs, img)
        assert open(ours, "rb").read() == open(theirs, "rb").read()
        np.testing.assert_array_equal(
            image_io.load_raw_float32_image(theirs),
            ref_io.load_raw_float32_image(ours),
        )


def test_resize_to_target_matches_reference(reference_root):
    from utils import image_io as ref_io

    rng = np.random.default_rng(2)
    img = rng.random((123, 217, 3)).astype(np.float32)
    ours = image_io.resize_to_target(img, 64, align=16)
    theirs = ref_io.resize_to_target(img, 64, align=16, suppress_messages=True)
    np.testing.assert_array_equal(ours, theirs)
