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
