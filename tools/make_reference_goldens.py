"""Produce REFERENCE-implementation depth goldens for
tests/test_real_checkpoint.py::test_real_checkpoint_depth_matches_reference_golden.

This must run in an environment where the reference
(facebookresearch/consistent_depth) is importable WITH its third_party
submodules checked out and the published weights downloaded — i.e. not
this offline image (its /root/reference has empty submodule dirs; see
CHECKPOINT_ATTEMPT.log). The moment such an environment exists, run:

    python tools/make_reference_goldens.py --reference /path/to/consistent_depth \
        --models mc,midas2,monodepth2

and commit the resulting ``tests/golden/real_depth/{name}.npz`` files.
Each golden stores the exact model inputs (BGR float images in [0,1])
and the reference model's depth output on them
(reference contract: monodepth/depth_model.py::forward, invoked by
depth_fine_tuning.py::save_depth via estimate_depth), so the test can
assert our flax forward with the same real checkpoint lands within 1%
relative RMSE — the north-star parity bound.

The input frames are deterministic synthetic images generated here (so
the golden is self-contained and needs no demo download); any frames
work because both implementations see bit-identical inputs.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "tests", "golden", "real_depth")

# (reference depth_model_registry name, our adapter name, feed H, W)
MODELS = {
    "mc": ("mc", 224, 384),
    "midas2": ("midas2", 224, 384),
    "monodepth2": ("monodepth2", 224, 384),
}


def golden_frames(h: int, w: int, n: int = 2) -> np.ndarray:
    """Deterministic photo-like inputs: smooth gradients + texture,
    float32 BGR in [0,1], shape (n, h, w, 3). Must match
    tests/test_real_checkpoint.py::_golden_frames exactly."""
    rng = np.random.default_rng(2026)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    for i in range(n):
        base = np.stack(
            [0.5 + 0.4 * np.sin(2 * np.pi * (xx / w + 0.13 * i + c / 3))
             * np.cos(2 * np.pi * (yy / h - 0.07 * i))
             for c in range(3)], axis=-1)
        tex = rng.random((h // 8, w // 8, 3), np.float32)
        tex = np.kron(tex, np.ones((8, 8, 1), np.float32))
        frames.append(np.clip(0.7 * base + 0.3 * tex, 0.0, 1.0))
    return np.asarray(frames, np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True,
                    help="checkout of facebookresearch/consistent_depth "
                         "with submodules + downloaded checkpoints")
    ap.add_argument("--models", default=",".join(MODELS))
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    os.chdir(args.reference)  # reference uses cwd-relative checkpoint paths
    try:
        import torch
        from monodepth.depth_model_registry import get_depth_model
    except ImportError as e:
        sys.exit(
            f"reference not importable ({e}) — this tool needs the "
            "reference repo with third_party submodules checked out")

    os.makedirs(OUT_DIR, exist_ok=True)
    for name in args.models.split(","):
        ref_name, h, w = MODELS[name]
        model = get_depth_model(ref_name)()  # loads published weights
        model.eval()
        frames = golden_frames(h, w)
        # reference DepthModel.forward: (N, C, H, W) BGR in [0,1]
        # (monodepth/depth_model.py:12-15); models call .cuda() internally
        t = torch.from_numpy(frames.transpose(0, 3, 1, 2))
        with torch.no_grad():
            depth = model.forward(t, None)
        depth = depth.detach().cpu().numpy().reshape(frames.shape[:3])
        out = os.path.join(OUT_DIR, f"{name}.npz")
        np.savez_compressed(
            out, images=frames, depth=depth.astype(np.float32),
            layout=np.array("bgr_nhwc"), feed=np.array([h, w]))
        print(f"wrote {out}: depth range [{depth.min():.4g}, "
              f"{depth.max():.4g}]")


if __name__ == "__main__":
    main()
