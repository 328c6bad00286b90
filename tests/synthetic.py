"""Synthetic scene fixture: a textured fronto-parallel-ish plane seen by
a moving camera, with geometrically exact flows and full masks. Used for
end-to-end smoke tests (a perfect depth estimate has ~0 consistency
loss) and to build a reference-layout dataset directory on disk."""

import os
from os.path import join as pjoin

import numpy as np

from consistent_depth_tpu.io import image_io, metadata_io
from consistent_depth_tpu.ops import geometry

import jax.numpy as jnp


def make_scene(num_frames=6, H=32, W=48, seed=0):
    """Returns dict with frames (N,H,W,3), depths (N,H,W), intrinsics
    (N,4), extrinsics (N,3,4). Scene: plane z=-2 with smooth texture;
    camera translating along x with small rotations."""
    rng = np.random.default_rng(seed)
    fx = fy = W * 1.2
    cx, cy = (W - 1) / 2, (H - 1) / 2
    intrinsics = np.tile(
        np.array([fx, fy, cx, cy], np.float32), (num_frames, 1))

    # bounded TOTAL motion: the per-frame steps below match the
    # original test-sized scenes (N <= ~20) exactly, but for demo-sized
    # N they would spin the camera past the plane (4.9 rad at N=244 —
    # negative/degenerate depths, chaotic training); cap the totals and
    # spread them over the trajectory instead
    n1 = max(num_frames - 1, 1)
    rot_step = min(0.02, 0.4 / n1)
    tx_step = min(0.08, 1.2 / n1)
    ty_step = min(0.01, 0.15 / n1)

    extrinsics = []
    for i in range(num_frames):
        angle = rot_step * i
        R = np.array([
            [np.cos(angle), 0, np.sin(angle)],
            [0, 1, 0],
            [-np.sin(angle), 0, np.cos(angle)],
        ])
        t = np.array([tx_step * i, ty_step * i, 0.0])
        extrinsics.append(
            np.concatenate([R, t[:, None]], axis=1).astype(np.float32))
    extrinsics = np.stack(extrinsics)

    # plane at world z = -2 (in front of all cameras, which look along -z)
    plane_z = -2.0

    # texture: smooth random Fourier features over world x, y
    coefs = rng.standard_normal((3, 6))
    freqs = rng.uniform(0.5, 3.0, (2, 6))
    phases = rng.uniform(0, 2 * np.pi, 6)

    def texture(xw, yw):
        arg = (xw[..., None] * freqs[0] + yw[..., None] * freqs[1] + phases)
        basis = np.sin(arg)
        img = 0.5 + 0.25 * np.einsum("...k,ck->...c", basis, coefs)
        return np.clip(img, 0, 1).astype(np.float32)

    pixels = np.asarray(geometry.pixel_grid((H, W)))
    frames, depths = [], []
    for i in range(num_frames):
        rays = np.asarray(geometry.pixels_to_rays(
            jnp.asarray(pixels), jnp.asarray(intrinsics[i])))
        R, t = extrinsics[i][:, :3], extrinsics[i][:, 3]
        # world ray: origin t, direction R @ ray; intersect world z = plane_z
        dirs = rays @ R.T
        lam = (plane_z - t[2]) / dirs[..., 2]
        depth = lam  # camera-space z = -lam (ray z=-1) -> depth = lam
        pts_w = t + lam[..., None] * dirs
        frames.append(texture(pts_w[..., 0], pts_w[..., 1]))
        depths.append(depth.astype(np.float32))

    return {
        "frames": np.stack(frames),
        "depths": np.stack(depths),
        "intrinsics": intrinsics,
        "extrinsics": extrinsics,
    }


def exact_flow(scene, i, j):
    """Geometrically exact flow field from frame i to frame j (H, W, 2)."""
    depths = jnp.asarray(scene["depths"][[i, j]])
    intr = jnp.asarray(scene["intrinsics"][[i, j]])
    extr = jnp.asarray(scene["extrinsics"][[i, j]])
    uv = geometry.warping_field(extr, intr, depths, [1, 0])
    H, W = scene["depths"].shape[1:]
    pixels = np.asarray(geometry.pixel_grid((H, W)))
    return np.asarray(uv[0]) - pixels


def make_pairs(num_frames):
    return [(i, i + 1) for i in range(num_frames - 1)] + [
        (i, i + 2) for i in range(num_frames - 2)
    ]


def build_pair_arrays(scene, pairs):
    """In-memory PairData-compatible dict for engine tests."""
    N, H, W = scene["depths"].shape
    P = len(pairs)
    flows = np.zeros((P, 2, H, W, 2), np.float32)
    masks = np.ones((P, 2, H, W), np.float32)
    for p, (i, j) in enumerate(pairs):
        flows[p, 0] = exact_flow(scene, i, j)
        flows[p, 1] = exact_flow(scene, j, i)
    pair_arr = np.array(pairs, np.int32)
    return {
        "frames": scene["frames"][..., ::-1].copy(),  # BGR like the loader
        "pair_slots": pair_arr.copy(),
        "pair_ids": pair_arr.copy(),
        "flows": flows,
        "masks": masks,
        "intrinsics": scene["intrinsics"][pair_arr],
        "extrinsics": scene["extrinsics"][pair_arr],
    }


def build_e2e_dataset(path, num_frames=6, H=32, W=48):
    """Populate ``path`` with everything the video/colmap stages would
    have produced for the synthetic scene, exactly as the pipeline e2e
    test uses it (and as ``tools/make_golden.py`` regenerates golden
    artifacts from). Returns the scene dict.

    Layout mirrors the reference demo with precomputed COLMAP
    (reference README.md:40-43): frames.txt + color dirs + poses
    metadata + converted dense inverse depth + exact flows for every
    two-way hierarchical2 pair.
    """
    import cv2

    from consistent_depth_tpu.utils import frame_range, frame_sampling

    scene = make_scene(num_frames=num_frames, H=H, W=W)

    metadata_io.write_frames_txt(
        pjoin(path, "frames.txt"),
        metadata_io.FramesTxt(
            num_frames, W, H,
            [f"{i / 30:.6f}" for i in range(num_frames)]))
    for sub in ("color_full", "color_down_png", "color_flow"):
        os.makedirs(pjoin(path, sub), exist_ok=True)
    os.makedirs(pjoin(path, "color_down"), exist_ok=True)
    for i in range(num_frames):
        bgr = (scene["frames"][i][..., ::-1] * 255).astype(np.uint8)
        for sub in ("color_full", "color_down_png", "color_flow"):
            cv2.imwrite(pjoin(path, sub, f"frame_{i:06d}.png"), bgr)
        image_io.save_raw_float32_image(
            pjoin(path, "color_down", f"frame_{i:06d}.raw"),
            scene["frames"][i])

    os.makedirs(pjoin(path, "colmap_dense"), exist_ok=True)
    metadata_io.write_metadata(
        pjoin(path, "colmap_dense", "metadata.npz"),
        scene["intrinsics"], scene["extrinsics"])
    conv_dir = pjoin(path, "depth_colmap_dense", "depth")
    os.makedirs(conv_dir, exist_ok=True)
    for i in range(num_frames):
        image_io.save_raw_float32_image(
            pjoin(conv_dir, f"frame_{i:06d}.raw"),
            (1.0 / scene["depths"][i]).astype(np.float32))

    os.makedirs(pjoin(path, "flow"), exist_ok=True)
    fr = frame_range.FrameRange(
        frame_range.OptionalSet(), num_frames=num_frames)
    pairs = frame_sampling.SamplePairs.sample(
        [frame_sampling.SamplePairsOptions(
            frame_sampling.SamplePairsMode.HIERARCHICAL2)],
        fr, two_way=True)
    for (i, j) in pairs:
        image_io.save_raw_float32_image(
            pjoin(path, "flow", f"flow_{i:06d}_{j:06d}.raw"),
            exact_flow(scene, i, j))
    return scene


E2E_PIPELINE_ARGS = ["--batch_size", "2", "--num_epochs", "2",
                     "--model_type", "mc"]


def run_e2e_pipeline(path):
    """Run the full CLI pipeline on a ``build_e2e_dataset`` dir with the
    canonical e2e/golden parameters (random-init mc, f32, 2 epochs)."""
    from consistent_depth_tpu.cli.params import Video3dParamsParser
    from consistent_depth_tpu.pipeline.process import DatasetProcessor

    params = Video3dParamsParser().parse(["--path", path] + E2E_PIPELINE_ARGS)
    params.model_checkpoint = ""  # no pretrained weights in this env
    return DatasetProcessor().process(params)


def write_dataset_dir(path, scene, pairs):
    """Write a reference-layout dataset directory from the scene."""
    import cv2

    os.makedirs(pjoin(path, "color_down"), exist_ok=True)
    os.makedirs(pjoin(path, "color_down_png"), exist_ok=True)
    os.makedirs(pjoin(path, "flow"), exist_ok=True)
    os.makedirs(pjoin(path, "mask"), exist_ok=True)
    N, H, W = scene["depths"].shape
    for i in range(N):
        # .raw color is stored RGB (video.py:174 swizzles before saving)
        image_io.save_raw_float32_image(
            pjoin(path, "color_down", f"frame_{i:06d}.raw"),
            scene["frames"][i])
        cv2.imwrite(
            pjoin(path, "color_down_png", f"frame_{i:06d}.png"),
            (scene["frames"][i][..., ::-1] * 255).astype(np.uint8))
    for (i, j) in pairs:
        for (a, b) in ((i, j), (j, i)):
            image_io.save_raw_float32_image(
                pjoin(path, "flow", f"flow_{a:06d}_{b:06d}.raw"),
                exact_flow(scene, a, b))
            cv2.imwrite(
                pjoin(path, "mask", f"mask_{a:06d}_{b:06d}.png"),
                np.full((H, W), 255, np.uint8))
    metadata_io.write_metadata(
        pjoin(path, "metadata.npz"),
        scene["intrinsics"], scene["extrinsics"])
    metadata_io.write_flow_list(
        pjoin(path, "flow_list.json"),
        [list(p) for p in pairs] + [list(p)[::-1] for p in pairs])
    return path
