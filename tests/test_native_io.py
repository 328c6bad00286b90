"""Native IO core: parity with the pure-python codec (runs only when
native/libcdtpu.so has been built)."""

import numpy as np
import pytest

from consistent_depth_tpu.io import image_io

native = pytest.importorskip("consistent_depth_tpu.io._native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libcdtpu.so not built (make -C native)")


def test_native_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for shape in [(7, 5), (6, 4, 2), (8, 8, 3)]:
        img = rng.standard_normal(shape).astype(np.float32)
        fn = str(tmp_path / "x.raw")
        native.save_raw(fn, img)
        out = native.load_raw(fn)
        np.testing.assert_array_equal(out, img)


def test_native_matches_python_codec(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.standard_normal((9, 11, 3)).astype(np.float32)
    fn_n, fn_p = str(tmp_path / "n.raw"), str(tmp_path / "p.raw")
    native.save_raw(fn_n, img)

    # bypass the native fast path to force the pure-python writer
    import consistent_depth_tpu.io.image_io as iio
    saved = iio._nat
    try:
        iio._nat = None
        iio.save_raw_float32_image(fn_p, img)
    finally:
        iio._nat = saved
    assert open(fn_n, "rb").read() == open(fn_p, "rb").read()
    np.testing.assert_array_equal(
        native.load_raw(fn_p), image_io.load_raw_float32_image(fn_n))


def test_native_batch_read(tmp_path):
    rng = np.random.default_rng(2)
    imgs = rng.standard_normal((5, 6, 7, 3)).astype(np.float32)
    paths = []
    for i, img in enumerate(imgs):
        fn = str(tmp_path / f"f{i}.raw")
        native.save_raw(fn, img)
        paths.append(fn)
    out = native.load_raw_batch(paths, 6, 7, 3)
    np.testing.assert_array_equal(out, imgs)


def test_native_error_codes(tmp_path):
    with pytest.raises(FileNotFoundError):
        native.load_raw(str(tmp_path / "missing.raw"))
    bad = tmp_path / "bad.raw"
    bad.write_bytes(b"\x01\x00\x00\x00\x01\x00\x00\x00\xff\x00\x00\x00"
                    + b"\x04" + b"\x00" * 7)
    with pytest.raises(ValueError):
        native.load_raw(str(bad))


def test_batched_dataset_loaders_match_per_file(tmp_path):
    """load_color_batch / load_flow_batch / load_mask_batch must equal
    the per-file loaders regardless of the native fast path."""
    import cv2
    import numpy as np

    from consistent_depth_tpu.data import video_dataset as vd
    from consistent_depth_tpu.io import image_io

    rng = np.random.default_rng(0)
    H, W, N = 6, 8, 5
    color_paths, flow_paths, mask_paths = [], [], []
    for i in range(N):
        c = rng.random((H, W, 3)).astype(np.float32)
        f = rng.standard_normal((H, W, 2)).astype(np.float32)
        m = (rng.random((H, W)) > 0.5).astype(np.uint8) * 255
        cp = str(tmp_path / f"c{i}.raw")
        fp = str(tmp_path / f"f{i}.raw")
        mp = str(tmp_path / f"m{i}.png")
        image_io.save_raw_float32_image(cp, c)
        image_io.save_raw_float32_image(fp, f)
        cv2.imwrite(mp, m)
        color_paths.append(cp)
        flow_paths.append(fp)
        mask_paths.append(mp)

    got_c = vd.load_color_batch(color_paths)
    ref_c = np.stack([vd.load_color(p) for p in color_paths])
    np.testing.assert_array_equal(got_c, ref_c)

    got_f = vd.load_flow_batch(flow_paths, H, W)
    ref_f = np.stack([vd.load_flow(p) for p in flow_paths])
    np.testing.assert_array_equal(got_f, ref_f)

    got_m = vd.load_mask_batch(mask_paths)
    ref_m = np.stack([vd.load_mask(p) for p in mask_paths])
    np.testing.assert_array_equal(got_m, ref_m)
