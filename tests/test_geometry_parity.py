"""Numeric parity of the jnp geometry core against the torch reference
(the reference code is imported read-only as an oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from consistent_depth_tpu.ops import geometry, resample


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def _random_pose(rng):
    """Random proper rigid world-from-camera [R|t]."""
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.standard_normal((3, 1)) * 0.3
    return np.concatenate([Q, t], axis=1).astype(np.float32)


def _case(rng, B=3, H=12, W=17):
    intr = np.stack(
        [np.array([W * 1.1, W * 1.2, W / 2 - 0.3, H / 2 + 0.2]) for _ in range(B)]
    ).astype(np.float32)
    extr = np.stack([_random_pose(rng) for _ in range(B)])
    depths = (0.5 + rng.random((B, H, W))).astype(np.float32)
    return intr, extr, depths


def test_pixel_grid_matches_reference(reference_root):
    import torch
    from utils import geometry as ref_geo

    ours = np.asarray(geometry.pixel_grid((5, 7)))
    theirs = ref_geo.pixel_grid(2, (5, 7)).cpu().numpy()  # (2, 2, H, W)
    np.testing.assert_allclose(ours.transpose(2, 0, 1), theirs[0])
    np.testing.assert_allclose(ours.transpose(2, 0, 1), theirs[1])


def test_rays_project_roundtrip(rng):
    intr, _, depths = _case(rng)
    H, W = depths.shape[-2:]
    pixels = geometry.pixel_grid((H, W))
    points = geometry.pixels_to_points(jnp.asarray(intr), jnp.asarray(depths), pixels)
    # z component is negative depth
    np.testing.assert_allclose(np.asarray(points[..., 2]), -depths, rtol=1e-6)
    back = geometry.project(points, jnp.asarray(intr))
    np.testing.assert_allclose(
        np.asarray(back), np.broadcast_to(np.asarray(pixels), back.shape),
        atol=1e-3,
    )


def test_backproject_matches_reference(rng, reference_root):
    import torch
    from utils import geometry as ref_geo

    intr, _, depths = _case(rng)
    B, H, W = depths.shape
    pixels = geometry.pixel_grid((H, W))
    ours = geometry.pixels_to_points(
        jnp.asarray(intr), jnp.asarray(depths), pixels)

    t_pixels = ref_geo.pixel_grid(B, (H, W))
    theirs = ref_geo.pixels_to_points(
        torch.tensor(intr), torch.tensor(depths).unsqueeze(1), t_pixels
    ).detach().numpy()  # (B, 3, H, W)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), theirs, rtol=1e-5, atol=1e-5)


def test_project_matches_reference(rng, reference_root):
    import torch
    from utils import geometry as ref_geo

    intr, _, _ = _case(rng)
    B, H, W = 3, 12, 17
    points = rng.standard_normal((B, H, W, 3)).astype(np.float32)
    points[..., 2] = -np.abs(points[..., 2]) - 0.1
    ours = geometry.project(jnp.asarray(points), jnp.asarray(intr))
    theirs = ref_geo.project(
        torch.tensor(points.transpose(0, 3, 1, 2)), torch.tensor(intr)
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), theirs, rtol=1e-4, atol=1e-4)


def test_reproject_matches_reference(rng, reference_root):
    import torch
    from utils import geometry as ref_geo

    B, H, W = 3, 12, 17
    points = rng.standard_normal((B, H, W, 3)).astype(np.float32)
    extr_ref = np.stack([_random_pose(rng) for _ in range(B)])
    extr_tgt = np.stack([_random_pose(rng) for _ in range(B)])
    ours = geometry.reproject_points(
        jnp.asarray(points), jnp.asarray(extr_ref), jnp.asarray(extr_tgt))
    theirs = ref_geo.reproject_points(
        torch.tensor(points.transpose(0, 3, 1, 2)),
        torch.tensor(extr_ref), torch.tensor(extr_tgt),
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pad_outside", [False, True])
def test_sample_matches_torch_grid_sample(rng, reference_root, pad_outside):
    """Bilinear sampler must match torch grid_sample(align_corners=False,
    padding_mode='border') through the reference's uv normalization."""
    import torch
    from utils import geometry as ref_geo

    B, H, W, C = 2, 9, 13, 3
    data = rng.standard_normal((B, H, W, C)).astype(np.float32)
    scale = 3.0 if pad_outside else 1.0
    uv = (rng.random((B, H, W, 2)) * scale - (scale - 1) / 2).astype(np.float32)
    uv = uv * np.array([W - 1, H - 1], dtype=np.float32)

    ours = resample.sample_uv(jnp.asarray(data), jnp.asarray(uv))
    theirs = ref_geo.sample(
        torch.tensor(data.transpose(0, 3, 1, 2)),
        torch.tensor(uv.transpose(0, 3, 1, 2)),
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), theirs, rtol=1e-5, atol=1e-5)


def test_sample_nan_propagates():
    data = jnp.ones((1, 4, 4, 1))
    uv = jnp.full((1, 1, 1, 2), jnp.nan)
    out = resample.sample_uv(data, uv)
    assert np.isnan(np.asarray(out)).all()


def test_warp_image_matches_reference(rng, reference_root):
    import torch
    from utils import geometry as ref_geo

    intr, extr, depths = _case(rng, B=2)
    images = rng.random((2, 12, 17, 3)).astype(np.float32)
    ours = geometry.warp_image(
        jnp.asarray(images), jnp.asarray(depths),
        jnp.asarray(extr), jnp.asarray(intr), [1, 0])
    theirs = ref_geo.warp_image(
        torch.tensor(images.transpose(0, 3, 1, 2)),
        torch.tensor(depths).unsqueeze(1),
        torch.tensor(extr), torch.tensor(intr), [1, 0],
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), theirs, rtol=1e-4, atol=1e-4)


def test_calibrate_scale_matches_reference(rng, reference_root):
    import torch
    from utils import geometry as ref_geo

    intr, extr, depths = _case(rng, B=2)
    ours = geometry.calibrate_scale(
        jnp.asarray(extr), jnp.asarray(intr), jnp.asarray(depths))
    theirs = ref_geo.calibrate_scale(
        torch.tensor(extr), torch.tensor(intr),
        torch.tensor(depths).unsqueeze(1))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4)
