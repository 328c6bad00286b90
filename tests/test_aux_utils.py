"""Auxiliary utilities: numpy geometry twins, depth alignment, flow viz,
summaries writer."""

import numpy as np

import jax.numpy as jnp

from consistent_depth_tpu.ops import flow_viz, geometry, geometry_np
from consistent_depth_tpu.utils import depth_alignment


def test_geometry_np_matches_jnp():
    rng = np.random.default_rng(0)
    H, W = 8, 11
    intr = np.array([W * 1.3, W * 1.25, W / 2, H / 2], np.float32)
    depths = (0.5 + rng.random((H, W))).astype(np.float32)
    pixels = geometry_np.pixel_grid((H, W))
    pts_np = geometry_np.pixels_to_points(intr, depths, pixels)
    pts_j = geometry.pixels_to_points(
        jnp.asarray(intr), jnp.asarray(depths), jnp.asarray(pixels))
    np.testing.assert_allclose(pts_np, np.asarray(pts_j), rtol=1e-5)
    np.testing.assert_allclose(
        geometry_np.project(pts_np, intr), pixels, atol=1e-3)

    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    er = np.concatenate([Q, rng.standard_normal((3, 1))], 1).astype(np.float32)
    et = np.concatenate([Q.T, rng.standard_normal((3, 1))], 1).astype(np.float32)
    out_np = geometry_np.reproject_points(pts_np.reshape(-1, 3), er, et)
    out_j = geometry.reproject_points(
        jnp.asarray(pts_np)[None], jnp.asarray(er)[None], jnp.asarray(et)[None])
    np.testing.assert_allclose(
        out_np.reshape(H, W, 3), np.asarray(out_j)[0], rtol=1e-4, atol=1e-5)


def test_depth_alignment():
    rng = np.random.default_rng(1)
    gt = 1 + rng.random((20, 30))
    pred = gt / 2.5
    assert abs(depth_alignment.fit_scale(pred, gt) - 2.5) < 1e-6
    s, b = depth_alignment.fit_scale_shift(pred * 2 + 0.3, (gt * 2 + 0.3))
    aligned = depth_alignment.align_depths(pred, gt, "scale-shift")
    np.testing.assert_allclose(aligned, gt, atol=1e-6)
    # ransac robust to outliers
    noisy = pred.copy()
    noisy.ravel()[:30] = 100.0
    s = depth_alignment.fit_scale_ransac(noisy, gt)
    assert abs(s - 2.5) < 0.1


def test_flow_viz_shapes_and_range():
    rng = np.random.default_rng(2)
    flow = rng.standard_normal((16, 20, 2)).astype(np.float32) * 3
    img = flow_viz.flow_to_image(flow)
    assert img.shape == (16, 20, 3) and img.dtype == np.uint8
    # unknown flow renders black
    flow[0, 0] = 1e9
    img = flow_viz.flow_to_image(flow)
    assert (img[0, 0] == 0).all()
    # zero flow renders ~white center
    img0 = flow_viz.flow_to_image(np.zeros((4, 4, 2), np.float32))
    assert (img0 > 200).all()


def test_summaries_writer_roundtrip(tmp_path):
    """Event file structure: parse back our own TFRecord framing + CRC."""
    import struct

    from consistent_depth_tpu.training.summaries import (
        SummaryWriter, _masked_crc, make_image_grid)

    with SummaryWriter(str(tmp_path)) as w:
        w.add_scalar("loss", 1.5, 1)
        w.add_histogram("h", np.random.default_rng(0).random(100), 1)
        w.add_image("im", np.zeros((3, 8, 8), np.float32), 1)

    files = [f for f in tmp_path.iterdir() if "tfevents" in f.name]
    assert len(files) == 1
    blob = files[0].read_bytes()
    records = []
    off = 0
    while off < len(blob):
        (length,) = struct.unpack("<Q", blob[off:off + 8])
        len_crc = struct.unpack("<I", blob[off + 8:off + 12])[0]
        assert len_crc == _masked_crc(blob[off:off + 8])
        payload = blob[off + 12:off + 12 + length]
        data_crc = struct.unpack(
            "<I", blob[off + 12 + length:off + 16 + length])[0]
        assert data_crc == _masked_crc(payload)
        records.append(payload)
        off += 16 + length
    assert len(records) == 4  # file header + 3 events
    assert b"loss" in records[1]

    grid = make_image_grid(np.zeros((5, 4, 6, 3), np.float32), nrow=3)
    assert grid.shape == (2 * (4 + 2) + 2, 3 * (6 + 2) + 2, 3)
