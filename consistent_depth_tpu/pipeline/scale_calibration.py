"""Metric-scale calibration against COLMAP dense depth
(reference: scale_calibration.py).

Aligns the monocular depth scale to COLMAP's metric scale: per-frame
median ratio of inverse depths -> scales.csv; frames with too few valid
COLMAP pixels are excluded from fine-tuning; extrinsic translations are
divided by the mean scale -> metadata_scaled.npz.
"""

from __future__ import annotations

import logging
import os
from os.path import join as pjoin
from typing import Optional, Set

import numpy as np

from ..io import colmap_io, image_io, metadata_io
from ..ops import geometry
from ..utils import visualization
from ..utils.helpers import print_banner
from .colmap_processor import COLMAPParams, COLMAPProcessor

import jax.numpy as jnp


class ScaleCalibrationParams:
    @staticmethod
    def add_arguments(parser):
        parser.add_argument(
            "--dense_frame_ratio", type=float, default=0.95,
            help="threshold on fraction of successfully computed dense "
                 "depth frames")
        parser.add_argument(
            "--dense_pixel_ratio", type=float, default=0.3,
            help="min ratio of valid dense-depth pixels for a frame to "
                 "be valid")


def prepare_colmap_color(video) -> str:
    """Black out dynamic-object regions if mask_dynamic exists
    (reference: scale_calibration.py:37-70)."""
    import cv2

    out_dir = pjoin(video.path, "color_colmap_dense")
    dynamic_mask_dir = pjoin(video.path, "mask_dynamic")
    color_src_dir = pjoin(video.path, "color_full")
    if not os.path.isdir(dynamic_mask_dir):
        return color_src_dir
    if video.check_frames(out_dir, "png"):
        return out_dir

    os.makedirs(out_dir, exist_ok=True)
    for i in range(video.frame_count):
        name = f"frame_{i:06d}.png"
        im = cv2.imread(pjoin(color_src_dir, name))
        seg = (cv2.imread(pjoin(dynamic_mask_dir, name), 0) > 0)[..., None]
        cv2.imwrite(pjoin(out_dir, name), im * seg)
    assert video.check_frames(out_dir, "png")
    return out_dir


def make_camera_params_from_colmap(path: str, sparse_dir: str):
    cameras, images, _points = colmap_io.read_model(sparse_dir, ext=".bin")
    size_new = image_io.load_raw_float32_image(
        pjoin(path, "color_down", "frame_{:06d}.raw".format(0))
    ).shape[:2][::-1]
    return colmap_io.convert_calibration(cameras, images, size_new)


def visualize_calibration_pair(
    extrinsics, intrinsics, depth_fmt, color_fmt, id_pair, vis_dir
):
    """Depth-based cross-warp sanity visualization
    (reference: scale_calibration.py:84-121)."""
    import cv2

    assert len(id_pair) == 2
    depth_fns = [depth_fmt.format(i) for i in id_pair]
    if any(not os.path.isfile(fn) for fn in depth_fns):
        return

    from ..data.video_dataset import load_color

    colors = np.stack([load_color(color_fmt.format(i)) for i in id_pair])
    inv_depths = np.stack(
        [image_io.load_raw_float32_image(fn) for fn in depth_fns])
    depths = 1.0 / inv_depths

    extr = jnp.asarray(extrinsics[list(id_pair)], jnp.float32)
    intr = jnp.asarray(intrinsics[list(id_pair)], jnp.float32)
    warped = np.asarray(geometry.warp_image(
        jnp.asarray(colors), jnp.asarray(depths), extr, intr, [1, 0]))

    def vis(x):
        return np.clip(x, 0, 1)[..., ::-1][..., ::-1] * 255  # BGR already

    os.makedirs(vis_dir, exist_ok=True)
    for idx, (i, tgt_i) in enumerate(zip(id_pair, id_pair[::-1])):
        cv2.imwrite(pjoin(vis_dir, f"frame_{i:06d}.png"),
                    np.clip(colors[idx], 0, 1) * 255)
        cv2.imwrite(
            pjoin(vis_dir, f"frame_{tgt_i:06d}_warped_to_{i:06d}.png"),
            np.clip(warped[idx], 0, 1) * 255)


def visualize_all_calibration(
    extrinsics, intrinsics, depth_fmt, color_fmt, frame_range, vis_dir
):
    id_pairs = [
        (frame_range.index_to_frame[i], frame_range.index_to_frame[0])
        for i in range(1, len(frame_range))
    ]
    for id_pair in id_pairs:
        visualize_calibration_pair(
            extrinsics, intrinsics, depth_fmt, color_fmt, id_pair, vis_dir)


def check_frames_convertible(src_dir, src_ext, dst_dir, dst_ext,
                             frame_names: Optional[Set[str]] = None) -> bool:
    """(reference: scale_calibration.py:137-151)"""
    if not os.path.isdir(src_dir):
        assert frame_names is not None
        names = list(frame_names)
    else:
        names = [n.replace(src_ext, dst_ext)
                 for n in os.listdir(src_dir) if n.endswith(src_ext)]
        names = [n for n in names if frame_names is None or n in frame_names]
    return all(os.path.isfile(pjoin(dst_dir, n)) for n in names)


def calibrate_scale(video, out_dir: str, frame_range, args) -> Set[int]:
    """Full calibration stage; returns the set of valid frames
    (reference: scale_calibration.py:154-328)."""
    import cv2

    print_banner("COLMAP reconstruction")

    colmap_dir = pjoin(video.path, "colmap_dense")
    src_meta_file = pjoin(colmap_dir, "metadata.npz")
    colmap = COLMAPProcessor(args.colmap_bin_path)
    dense_dir = colmap.dense_dir(colmap_dir, 0)

    if os.path.isfile(src_meta_file):
        print("Checked metadata file exists.")
    else:
        color_dir = prepare_colmap_color(video)
        if not colmap.check_dense(
            dense_dir, color_dir, valid_ratio=args.dense_frame_ratio
        ):
            path_args = [color_dir, colmap_dir]
            mask_path = pjoin(video.path, "colmap_mask")
            if os.path.isdir(mask_path):
                path_args.extend(["--mask_path", mask_path])
            colmap_args = COLMAPParams().parse_args(
                args=path_args + ["--dense_max_size", str(args.size)],
                namespace=args)
            colmap.process(colmap_args)

        intrinsics, extrinsics = make_camera_params_from_colmap(
            video.path, colmap.sparse_dir(colmap_dir, 0))
        metadata_io.write_metadata(src_meta_file, intrinsics, extrinsics)

    print_banner("Convert COLMAP depth maps")

    converted_depth_fmt = pjoin(
        video.path, "depth_colmap_dense", "depth", "frame_{:06d}.raw")
    converted_depth_dir = os.path.dirname(converted_depth_fmt)
    dense_depth_dir = pjoin(dense_dir, "stereo", "depth_maps")
    frames = frame_range.frames()

    if not check_frames_convertible(
        dense_depth_dir, colmap.dense_depth_suffix(), converted_depth_dir, "",
        frame_names={f"frame_{i:06d}.png" for i in frames},
    ):
        os.makedirs(converted_depth_dir, exist_ok=True)
        colmap_depth_fmt = pjoin(
            dense_depth_dir, "frame_{:06d}.png" + colmap.dense_depth_suffix())
        for i in frames:
            colmap_depth_fn = colmap_depth_fmt.format(i)
            if not os.path.isfile(colmap_depth_fn):
                logging.warning(
                    "[SCALE CALIBRATION] %s does not exist.", colmap_depth_fn)
                continue
            cmp_depth = colmap_io.read_array(colmap_depth_fn)
            inv_cmp_depth = 1.0 / cmp_depth
            ix = np.isinf(inv_cmp_depth) | (inv_cmp_depth < 0)
            inv_cmp_depth[ix] = float("nan")
            image_io.save_raw_float32_image(
                converted_depth_fmt.format(i), inv_cmp_depth)
        visualization.visualize_depth_dir(
            converted_depth_dir, converted_depth_dir,
            force=True, min_percentile=0, max_percentile=99)

    print_banner("Compute per-frame scales")

    scaled_depth_dir = pjoin(out_dir, "depth_scaled_by_colmap_dense", "depth")
    scaled_depth_fmt = pjoin(scaled_depth_dir, "frame_{:06d}.raw")
    scales_file = pjoin(out_dir, "scales.csv")
    src_depth_fmt = pjoin(
        video.path, f"depth_{args.model_type}", "depth", "frame_{:06d}.raw")

    if (
        check_frames_convertible(
            converted_depth_dir, ".png",
            os.path.dirname(scaled_depth_fmt), ".raw")
        and os.path.isfile(scales_file)
    ):
        src_to_colmap_scales = metadata_io.read_scales_csv(scales_file)
        assert (src_to_colmap_scales.shape[0]
                >= len(frames) * args.dense_frame_ratio
                and src_to_colmap_scales.shape[1] == 2), (
            f"scales shape is {src_to_colmap_scales.shape} does not match "
            f"({len(frames)}, 2) with threshold {args.dense_frame_ratio}")
        print("Existing scales file loaded.")
    else:
        os.makedirs(scaled_depth_dir, exist_ok=True)
        scales_map = {}
        for i in frames:
            converted_depth_fn = converted_depth_fmt.format(i)
            if not os.path.isfile(converted_depth_fn):
                logging.warning("[SCALE CALIBRATION] %s does not exist",
                                converted_depth_fn)
                continue
            inv_cmp_depth = image_io.load_raw_float32_image(converted_depth_fn)
            inv_src_depth = image_io.load_raw_float32_image(
                src_depth_fmt.format(i))
            inv_cmp_depth = cv2.resize(
                inv_cmp_depth, inv_src_depth.shape[:2][::-1],
                interpolation=cv2.INTER_NEAREST)
            ix = np.isfinite(inv_cmp_depth)
            if ix.sum() / ix.size < args.dense_pixel_ratio:
                continue
            scales = (inv_src_depth / inv_cmp_depth)[ix]
            scale = np.median(scales)
            print(f"Scale[{i}]: median={scale}, std={np.std(scales)}")
            scales_map[i] = float(scale)
            image_io.save_raw_float32_image(
                scaled_depth_fmt.format(i), inv_src_depth / scale)
        visualization.visualize_depth_dir(
            scaled_depth_dir, scaled_depth_dir, force=True)

        xs = sorted(scales_map.keys())
        src_to_colmap_scales = np.stack(
            (np.array(xs, np.float64),
             np.array([scales_map[x] for x in xs])), axis=-1)
        metadata_io.write_scales_csv(scales_file, src_to_colmap_scales)

    valid_frames = {int(s) for s in src_to_colmap_scales[:, 0]}

    scaled_meta_file = pjoin(out_dir, "metadata_scaled.npz")
    if os.path.isfile(scaled_meta_file):
        print("Scaled metadata file exists.")
    else:
        scales = src_to_colmap_scales[:, 1]
        mean_scale = scales.mean()
        print(f"[scales] mean={mean_scale}, std={np.std(scales)}")

        meta = metadata_io.read_metadata(src_meta_file)
        intrinsics, extrinsics = meta["intrinsics"], meta["extrinsics"]
        extrinsics[..., -1] /= mean_scale
        metadata_io.write_metadata(
            scaled_meta_file, intrinsics, extrinsics,
            scales=src_to_colmap_scales)

        color_fmt = pjoin(video.path, "color_down", "frame_{:06d}.raw")
        vis_dir = pjoin(out_dir, "vis_calibration_dense")
        visualize_all_calibration(
            extrinsics, intrinsics, scaled_depth_fmt, color_fmt,
            frame_range, vis_dir)

    return valid_frames
