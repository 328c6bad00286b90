"""Depth-rendering parity: the gamma-folded uint8 LUT must reproduce
bit-for-bit the PNG pixels the reference's float pipeline produced.

The reference renders ``((magma(x)/255) ** 2.2) * 255`` as a float
image and lets ``cv2.imwrite`` saturate-cast it to u8 (reference:
utils/visualization.py:20-37). Our ``_magma_lut`` folds the gamma into
the 256-entry LUT with ``np.rint`` (= cv2's round-half-to-even
``saturate_cast<uchar>``), so ``visualize_depth`` returns u8 directly
— skipping a per-frame float64 power (measured ~1.1 s per 244-frame
epoch on a 1-core host; PERF.md "Measured end-to-end")."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from consistent_depth_tpu.utils import visualization  # noqa: E402


def _reference_float_render(depth, depth_min, depth_max):
    """The pre-fold float pipeline, reconstructed verbatim."""
    from matplotlib import cm

    colors = np.array(cm.get_cmap("magma").colors)
    lut = (colors[:, None, ::-1] * 255).astype(np.uint8)
    ds = (depth - depth_min) / (depth_max - depth_min)
    ds = np.clip(np.nan_to_num(ds), 0, 1) ** 0.5
    du8 = np.uint8(ds * 255)
    return ((cv2.applyColorMap(du8, lut) / 255) ** 2.2) * 255


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_visualize_depth_matches_float_pipeline_bitwise(seed, tmp_path):
    rng = np.random.default_rng(seed)
    scale = float(10.0 ** float(rng.integers(-2, 3)))
    depth = rng.random((63, 87)).astype(np.float32) * scale
    dmin, dmax = float(depth.min()), float(depth.max())

    got = visualization.visualize_depth(depth, dmin, dmax)
    assert got.dtype == np.uint8

    ref_float = _reference_float_render(depth, dmin, dmax)
    old_png = str(tmp_path / "old.png")
    new_png = str(tmp_path / "new.png")
    # what the float pipeline's imwrite wrote (internal saturate_cast)
    cv2.imwrite(old_png, ref_float)
    cv2.imwrite(new_png, got)
    np.testing.assert_array_equal(
        cv2.imread(old_png), cv2.imread(new_png))


def test_visualize_depth_nan_and_degenerate_range():
    depth = np.full((8, 8), 2.0, np.float32)
    depth[0, 0] = np.nan
    # degenerate range: 0/0 -> nan -> nan_to_num -> 0, no crash
    out = visualization.visualize_depth(depth, 2.0, 2.0)
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8
