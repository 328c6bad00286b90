"""Batched multi-video serving tests (virtual CPU mesh).

Covers: batched parity with direct eval-mode inference, padding of
ragged final batches, multi-resolution bucketing with alignment
padding/cropping, interleaved multi-video serving, and data-parallel
serving over the 8-device mesh.
"""

import numpy as np
import pytest

from consistent_depth_tpu.models.mannequin_challenge import (
    MannequinChallengeModel,
)
from consistent_depth_tpu.parallel import make_mesh
from consistent_depth_tpu.serving import DepthServer, ServeConfig

pytestmark = pytest.mark.slow  # compile-heavy


@pytest.fixture(scope="module")
def model():
    return MannequinChallengeModel(checkpoint="", seed=0)


def _direct(model, frames):
    """Oracle: one eval-mode forward over all frames at once."""
    import jax.numpy as jnp

    depth, _ = model.apply(
        model.variables, jnp.asarray(frames, np.float32)[:, None],
        train=False)
    return np.asarray(depth)[:, 0]


def _server(model, **kw):
    kw.setdefault("precision", "f32")
    kw.setdefault("batch_size", 2)
    return DepthServer(ServeConfig(**kw), model=model)


def test_infer_frames_matches_direct(model):
    rng = np.random.default_rng(0)
    frames = rng.random((5, 32, 48, 3), np.float32)  # 3 batches, last padded
    server = _server(model)
    got = server.infer_frames(frames)
    want = _direct(model, frames)
    assert got.shape == (5, 32, 48)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_multi_resolution_buckets(model):
    """Unaligned frames are padded to the align multiple and cropped
    back; two resolutions in one stream use two programs."""
    rng = np.random.default_rng(1)
    small = [rng.random((30, 44, 3), np.float32) for _ in range(2)]
    big = [rng.random((48, 64, 3), np.float32) for _ in range(2)]
    server = _server(model)
    reqs = [("s0", small[0]), ("b0", big[0]),
            ("s1", small[1]), ("b1", big[1])]
    out = dict(server.serve(iter(reqs)))
    assert set(out) == {"s0", "s1", "b0", "b1"}
    assert out["s0"].shape == (30, 44)
    assert out["b1"].shape == (48, 64)
    # padded-and-cropped result == direct inference on the padded frame,
    # cropped the same way
    padded = np.zeros((1, 32, 48, 3), np.float32)
    padded[0, :30, :44] = small[0]
    padded[0, 30:] = padded[0, 29:30]
    padded[0, :, 44:] = padded[0, :, 43:44]
    np.testing.assert_allclose(
        out["s0"], _direct(model, padded)[0, :30, :44],
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        out["b0"], _direct(model, big[0][None])[0], rtol=1e-5, atol=1e-5)


def test_infer_videos_interleaved(model):
    """Frames of several videos share batches; every frame's depth
    matches direct inference."""
    rng = np.random.default_rng(2)
    videos = {
        "a": rng.random((3, 32, 48, 3), np.float32),
        "b": rng.random((5, 32, 48, 3), np.float32),
    }
    server = _server(model)
    out = server.infer_videos(videos)
    for vid, frames in videos.items():
        assert out[vid].shape == frames.shape[:3]
        np.testing.assert_allclose(
            out[vid], _direct(model, frames), rtol=1e-5, atol=1e-5)


def test_mesh_serving_parity(model):
    """Sharded serving over the 8-device mesh produces the same depths
    as the unsharded path."""
    rng = np.random.default_rng(3)
    frames = rng.random((8, 32, 48, 3), np.float32)
    plain = _server(model, batch_size=8).infer_frames(frames)
    sharded = _server(model, batch_size=8,
                      mesh=make_mesh(8)).infer_frames(frames)
    np.testing.assert_allclose(sharded, plain, rtol=1e-5, atol=1e-5)


def test_flush_max_wait_bounds_latency(model):
    """With flush_max_wait=N, a straggler bucket is flushed (padded)
    after N foreign requests instead of waiting for end of stream."""
    rng = np.random.default_rng(4)
    small = rng.random((32, 48, 3), np.float32)
    big = [rng.random((64, 64, 3), np.float32) for _ in range(6)]

    server = _server(model, batch_size=2, flush_max_wait=2)

    order = []

    def gen():
        yield "s0", small            # fills bucket (32,48) to 1 of 2
        for i, f in enumerate(big):  # foreign traffic
            yield f"b{i}", f

    for key, depth in server.serve(gen()):
        order.append(key)
    # the straggler was flushed after 2 foreign requests: its result
    # arrives before the later big batches, NOT last
    assert order.index("s0") < order.index("b4")
    assert set(order) == {"s0"} | {f"b{i}" for i in range(6)}


def test_max_in_flight_preserves_results(model):
    """A deeper dispatch pipeline returns identical depths."""
    rng = np.random.default_rng(5)
    frames = rng.random((7, 32, 48, 3), np.float32)
    shallow = _server(model, batch_size=2, max_in_flight=1)
    deep = _server(model, batch_size=2, max_in_flight=3)
    np.testing.assert_allclose(
        deep.infer_frames(frames), shallow.infer_frames(frames),
        rtol=1e-6, atol=1e-6)
