"""Native flow runner: end-to-end pair processing with a random-weight
cascade (shape/IO contract) + homography compose correctness."""

import os

import numpy as np
import pytest

from consistent_depth_tpu.flow import backends
from consistent_depth_tpu.io import image_io


def test_resize_flow_scales_vectors():
    flow = np.ones((10, 20, 2), np.float32)
    out = backends.resize_flow(flow, (40, 20))
    assert out.shape == (20, 40, 2)
    np.testing.assert_allclose(out[..., 0], 2.0)
    np.testing.assert_allclose(out[..., 1], 2.0)


def test_compose_homography_identity():
    flow = np.random.default_rng(0).standard_normal((8, 10, 2)).astype(np.float32)
    out = backends.compose_homography_flow(flow, np.eye(3))
    np.testing.assert_allclose(out, flow, atol=1e-5)


def test_compose_homography_translation():
    """If the aligned frame was shifted by (tx, ty), composing H^-1
    adds that shift back into the flow."""
    flow = np.zeros((8, 10, 2), np.float32)
    H = np.array([[1, 0, 3], [0, 1, -2], [0, 0, 1]], np.float64)
    out = backends.compose_homography_flow(flow, H)
    np.testing.assert_allclose(out[..., 0], -3, atol=1e-5)
    np.testing.assert_allclose(out[..., 1], 2, atol=1e-5)


@pytest.mark.slow  # compiles the full FlowNet2 cascade
def test_jax_backend_process_pairs(tmp_path):
    import cv2

    from consistent_depth_tpu.flow.runner import JaxFlowBackend

    frame_dir = str(tmp_path / "color_flow")
    os.makedirs(frame_dir)
    rng = np.random.default_rng(1)
    for i in range(2):
        cv2.imwrite(os.path.join(frame_dir, f"frame_{i:06d}.png"),
                    rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
    out_fmt = str(tmp_path / "flow_{:06d}_{:06d}.raw")

    backend = JaxFlowBackend(homography=False)  # random weights
    backend.process_pairs(frame_dir, [(0, 1), (1, 0)], out_fmt, (48, 32))
    for pair in [(0, 1), (1, 0)]:
        flow = image_io.load_raw_float32_image(out_fmt.format(*pair))
        assert flow.shape == (32, 48, 2)
        assert np.isfinite(flow).all()


def test_create_backend_defaults_to_precomputed():
    b = backends.create_flow_backend("FlowNet2")
    assert isinstance(b, backends.PrecomputedFlowBackend)


def test_standalone_cli_plumbing(tmp_path, monkeypatch):
    """The standalone flow CLI (reference:
    optical_flow_flownet2_homography.py:108-271) reads image pairs,
    writes .raw flow (+ optional PNG), skips existing outputs."""
    import cv2

    from consistent_depth_tpu.flow import runner

    rng = np.random.default_rng(0)
    for i in (1, 2):
        cv2.imwrite(str(tmp_path / f"im{i}.png"),
                    (rng.random((16, 24, 3)) * 255).astype(np.uint8))

    calls = []

    class FakeBackend:
        def __init__(self, **kw):
            calls.append(kw)

        def compute_pair(self, im1, im2):
            assert im1.shape == (16, 24, 3) and im1.dtype == np.float32
            return np.stack([np.ones((16, 24), np.float32),
                             np.zeros((16, 24), np.float32)], -1)

    monkeypatch.setattr(runner, "JaxFlowBackend", FakeBackend)
    out = tmp_path / "sub" / "flow.raw"
    argv = ["--im1", str(tmp_path / "im1.png"),
            "--im2", str(tmp_path / "im2.png"),
            "--out", str(out), "--size", "8", "12",
            "--visualize", "--no-homography"]
    runner.main(argv)

    assert calls[0]["homography"] is False
    flow = image_io.load_raw_float32_image(str(out))
    assert flow.shape == (8, 12, 2)
    # resize_flow rescales the u component by the width ratio 12/24
    np.testing.assert_allclose(flow[..., 0], 0.5, atol=1e-6)
    assert (tmp_path / "sub" / "flow.png").is_file()

    # second run: output exists -> backend never invoked again
    n = len(calls)
    runner.main(argv)
    assert len(calls) == n + 1  # constructed once more, compute skipped


@pytest.mark.slow  # compiles the FlowNet cascade
def test_flow_stage_with_native_backend(tmp_path, monkeypatch):
    """The CLI-driven native flow path end-to-end THROUGH the pipeline
    stage: create_flow_backend auto-selects JaxFlowBackend from a saved
    .pth checkpoint (reference checkpoint cache contract,
    flow.py:100-107), Flow.compute_flow runs the net on the frame pairs,
    and the downstream mask stage consumes its outputs."""
    import cv2

    import jax
    import jax.numpy as jnp

    from consistent_depth_tpu.flow.flownet import FlowNet2CSS
    from consistent_depth_tpu.models import torch_import
    from consistent_depth_tpu.pipeline.flow_stage import Flow

    # save a random-init CSS checkpoint the backend must discover
    ckpt_dir = tmp_path / "checkpoints"
    ckpt_dir.mkdir()
    x = jnp.zeros((1, 64, 64, 3))
    variables = FlowNet2CSS().init(jax.random.PRNGKey(0), x, x)
    torch_import.save_torch_checkpoint(
        str(ckpt_dir / "flownet2-kitti.pth"), variables)
    monkeypatch.setenv("CDTPU_CHECKPOINT_DIR", str(ckpt_dir))

    from consistent_depth_tpu.flow import backends as be
    from consistent_depth_tpu.flow.runner import JaxFlowBackend

    backend = be.create_flow_backend("FlowNet2-KITTI")
    assert isinstance(backend, JaxFlowBackend)
    assert backend.homography is False  # KITTI skips pre-alignment

    # dataset dir: color_flow PNGs + color_down .raws (for target size)
    path = str(tmp_path / "ds")
    for sub in ("color_flow", "color_down"):
        os.makedirs(os.path.join(path, sub))
    rng = np.random.default_rng(3)
    H, W = 32, 48
    for i in range(3):
        im = rng.random((H, W, 3)).astype(np.float32)
        cv2.imwrite(os.path.join(path, "color_flow", f"frame_{i:06d}.png"),
                    (im * 255).astype(np.uint8))
        image_io.save_raw_float32_image(
            os.path.join(path, "color_down", f"frame_{i:06d}.raw"), im)

    pairs = [(0, 1), (1, 0), (1, 2), (2, 1)]
    flow = Flow(path, str(tmp_path / "out"))
    flow.compute_flow(pairs, checkpoint="FlowNet2-KITTI")
    for (i, j) in pairs:
        f = image_io.load_raw_float32_image(
            os.path.join(path, "flow", f"flow_{i:06d}_{j:06d}.raw"))
        assert f.shape == (H, W, 2)
        assert np.isfinite(f).all()

    # downstream stage consumes the net-produced flow
    flow.mask_valid_correspondences()
    for (i, j) in pairs:
        m = cv2.imread(
            os.path.join(path, "mask", f"mask_{i:06d}_{j:06d}.png"), 0)
        assert m is not None and m.shape == (H, W)


def _textured_image(H_img, W_img, seed):
    """Multi-octave smoothed noise: enough distinctive structure for
    feature detection (the scene fixture's low-frequency Fourier texture
    starves SIFT of keypoints)."""
    import cv2

    rng = np.random.default_rng(seed)
    img = np.zeros((H_img, W_img), np.float32)
    for octave, amp in ((8, 0.5), (16, 0.3), (32, 0.2)):
        small = rng.random((H_img // octave + 1, W_img // octave + 1))
        img += amp * cv2.resize(
            small.astype(np.float32), (W_img, H_img),
            interpolation=cv2.INTER_CUBIC)
    img = (img - img.min()) / (img.max() - img.min())
    return np.repeat(img[..., None], 3, axis=-1)


def test_homography_alignment_fidelity_on_realistic_frames():
    """Quantitative check of the SIFT/RANSAC pre-alignment (the
    reference uses the patented SURF —
    optical_flow_flownet2_homography.py:66-107): frame 2 is an EXACT
    homography warp of frame 1 (the camera-over-plane scenario the
    pre-alignment targets), so the recovered H must reproduce the
    ground-truth map to sub-pixel accuracy."""
    import cv2

    H_img, W_img = 192, 256
    im1 = _textured_image(H_img, W_img, seed=2)
    # plausible inter-frame motion: shift + slight rotation + perspective
    angle = np.deg2rad(2.0)
    H_true = np.array([
        [np.cos(angle), -np.sin(angle), 6.0],
        [np.sin(angle), np.cos(angle), -3.5],
        [1.5e-4, -1e-4, 1.0],
    ])
    # im2 warped by H_true^-1 so that H_true maps im2 coords -> im1
    im2 = cv2.warpPerspective(
        im1, np.linalg.inv(H_true), (W_img, H_img),
        flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)

    H_mat, warped = backends.align_homography(im1, im2)
    assert H_mat is not None, "SIFT must register the textured frames"

    xs = np.arange(16, W_img - 16, 16, dtype=np.float64)
    ys = np.arange(16, H_img - 16, 16, dtype=np.float64)
    X, Y = np.meshgrid(xs, ys)
    pts = np.stack([X, Y], axis=-1).reshape(-1, 1, 2)
    got = cv2.perspectiveTransform(pts, H_mat.astype(np.float64))
    want = cv2.perspectiveTransform(pts, H_true)
    err = np.linalg.norm((got - want).reshape(-1, 2), axis=-1)
    assert np.median(err) < 0.5, (np.median(err), err.max())
    assert np.mean(err < 1.0) > 0.9, np.mean(err < 1.0)

    # and the warp it produces actually registers the images (residual
    # includes two bilinear-resample blurs, so parity with the raw
    # motion magnitude is not expected — only a clear reduction)
    diff = np.abs(warped - im1).mean()
    base = np.abs(im2 - im1).mean()
    assert diff < 0.5 * base, (diff, base)

    # End-to-end flow fidelity: for a pure-homography scene the
    # residual flow on the aligned pair is ~0, so composing the
    # recovered H back (the runner's un-warping step, reference
    # optical_flow_flownet2_homography.py:201-224) must reproduce the
    # ground-truth displacement field p -> H_true^-1 p - p to
    # sub-pixel end-point error over the interior.
    zero_flow = np.zeros((H_img, W_img, 2), np.float32)
    composed = backends.compose_homography_flow(zero_flow, H_mat)
    X, Y = np.meshgrid(np.arange(W_img, dtype=np.float64),
                       np.arange(H_img, dtype=np.float64))
    pts = np.stack([X, Y], axis=-1).reshape(-1, 1, 2)
    true_flow = (cv2.perspectiveTransform(pts, np.linalg.inv(H_true))
                 .reshape(H_img, W_img, 2) - np.stack([X, Y], axis=-1))
    interior = (slice(16, -16), slice(16, -16))
    epe = np.linalg.norm(
        composed[interior] - true_flow[interior], axis=-1)
    assert np.median(epe) < 0.5, (np.median(epe), epe.max())


def test_homography_impact_real_photo():
    """SIFT-for-SURF substitution quantified on a REAL photograph
    (tools/homography_impact.py; reference pre-alignment:
    optical_flow_flownet2_homography.py:66-107). Pins (a) sub-pixel H
    recovery on real texture, (b) the composed-flow operator's
    H-independence (why the detector choice cannot move the final flow
    when registration succeeds), (c) the alignment's purpose: residual
    motion well under a pixel."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "homography_impact",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "homography_impact.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    report = mod.main()

    assert report["sift_H_corner_err_px_median"] < 0.5
    assert report["composed_flow_delta_px"]["via_sift_H_p95"] < 0.01
    assert report["motion_px_median"]["unaligned"] > 5
    assert report["motion_px_median"]["after_sift_alignment"] < 0.2
