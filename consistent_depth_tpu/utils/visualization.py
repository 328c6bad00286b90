"""Depth/mask visualization (reference: utils/visualization.py)."""

from __future__ import annotations

import logging
import os
import subprocess
import sys

import numpy as np

from ..io import image_io


def _magma_lut() -> np.ndarray:
    """(256, 1, 3) uint8 BGR magma colormap LUT with the rendering's
    gamma-2.2 pass folded in.

    The reference computes ``((colormap(x)/255) ** 2.2) * 255`` as a
    float image per frame and lets ``cv2.imwrite`` saturate-cast it to
    u8 (reference: utils/visualization.py:20-37). Since the colormap is
    a 256-entry lookup, applying the gamma to the LUT entries once and
    rounding with ``np.rint`` (= cv2's round-half-to-even
    ``saturate_cast<uchar>``) yields bit-identical PNG pixels while
    skipping a per-frame float64 power over H*W*3 — measured ~1.1 s per
    244-frame epoch on a 1-core host (PERF.md "Measured end-to-end")."""
    from matplotlib import cm

    colors = np.array(cm.get_cmap("magma").colors)  # (256, 3) RGB [0,1]
    lut = (colors[:, None, ::-1] * 255).astype(np.uint8)
    return np.rint(((lut / 255.0) ** 2.2) * 255).astype(np.uint8)


_CM_MAGMA = None


def visualize_depth(depth, depth_min=None, depth_max=None):
    """Magma-colored sqrt-scaled gamma-2.2 depth rendering
    (reference: utils/visualization.py:20-37). Returns uint8 BGR
    image (same pixels cv2.imwrite produced from the reference's float
    output — see _magma_lut)."""
    global _CM_MAGMA
    import cv2

    if _CM_MAGMA is None:
        _CM_MAGMA = _magma_lut()
    depth = np.asarray(depth)
    if depth_min is None:
        depth_min = np.nanmin(depth)
    if depth_max is None:
        depth_max = np.nanmax(depth)

    depth_scaled = (depth - depth_min) / (depth_max - depth_min)
    depth_scaled = np.clip(np.nan_to_num(depth_scaled), 0, 1) ** 0.5
    depth_u8 = np.uint8(depth_scaled * 255)
    return cv2.applyColorMap(depth_u8, _CM_MAGMA)


def visualize_depth_dir(
    src_dir: str, dst_dir: str, force: bool = False, extension: str = ".raw",
    min_percentile: float = 0, max_percentile: float = 100,
):
    """Render every depth map in a directory with a shared global range
    (reference: utils/visualization.py:40-101)."""
    import cv2

    src_files, dst_files = [], []
    for file in sorted(os.listdir(src_dir)):
        base, ext = os.path.splitext(file)
        if ext.lower() == extension:
            src_files.append(file)
            dst_files.append(f"{base}.png")
    if not src_files:
        return
    if not force and all(
        os.path.exists(os.path.join(dst_dir, f)) for f in dst_files
    ):
        return

    d_min, d_max = sys.float_info.max, -sys.float_info.max

    def read(fn):
        if extension == ".raw":
            return image_io.load_raw_float32_image(os.path.join(src_dir, fn))
        return cv2.imread(os.path.join(src_dir, fn))

    for fn in src_files:
        disparity = read(fn)
        ix = np.isfinite(disparity)
        if ix.sum() == 0:
            logging.warning("%s has 0 valid depth", fn)
            continue
        valid = disparity[ix].astype(np.float64)
        d_min = min(d_min, float(np.percentile(valid, min_percentile)))
        d_max = max(d_max, float(np.percentile(valid, max_percentile)))

    os.makedirs(dst_dir, exist_ok=True)
    for src, dst in zip(src_files, dst_files):
        dst_path = os.path.join(dst_dir, dst)
        if os.path.exists(dst_path) and not force:
            continue
        cv2.imwrite(dst_path, visualize_depth(read(src), d_min, d_max))


def apply_mask(im, mask, mask_color=None):
    """Highlight masked-out regions (reference:
    utils/visualization.py:115-124)."""
    im = np.asarray(im)
    im = im.reshape(im.shape[:2] + (-1,))
    C = im.shape[-1]
    mask = np.asarray(mask).reshape(mask.shape[:2] + (-1,)) > 0
    if mask_color is None:
        mask_color = np.array([0, 255, 0] if C == 3 else 1)
    mask_color = np.asarray(mask_color).reshape(1, 1, C)
    result = 0.7 * im + 0.3 * ((1 - mask) * mask_color)
    return result.squeeze()


def create_video(pattern: str, output_file: str, ffmpeg_bin: str = "ffmpeg"):
    if not os.path.exists(output_file):
        cmd = [ffmpeg_bin, "-r", "30", "-i", pattern,
               "-c:v", "libx264", "-crf", "27", "-pix_fmt", "yuv420p",
               output_file]
        subprocess.call(cmd)
