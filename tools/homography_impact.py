"""Quantify the SIFT-for-SURF substitution in the flow runner's
homography pre-alignment on a REAL photograph (round-3 VERDICT
missing #3 / next-round #7).

The reference aligns frame2 onto frame1 with a SURF/RANSAC homography
before FlowNet2 and composes the flow back through H^-1
(optical_flow_flownet2_homography.py:66-107, 201-224). SURF is
patented and unavailable here (no cv2.xfeatures2d build exists in this
image), so a direct SURF-vs-SIFT A/B cannot run; this tool measures
the three quantities that bound the substitution's end-to-end effect
on a real photo (matplotlib's grace_hopper.jpg) under video-like
inter-frame warps:

1. H recovery error: corner displacement of SIFT/RANSAC's H vs the
   ground-truth H (the SURF delta is bounded by err_SURF + err_SIFT;
   each method's error vs GT is the auditable half).
2. Composed-flow H-independence: with an ideal residual flow, the flow
   composed through the estimated H vs through the TRUE H (and vs no
   homography at all) — the compose operator is algebraically
   H-independent, so any estimator whose H registers the pair leaves
   the final flow unchanged up to interpolation error. This is why the
   detector CHOICE (SURF vs SIFT) cannot move the composed flow as
   long as registration succeeds.
3. Residual motion after alignment vs without — the displacement
   magnitude FlowNet actually sees (the homography's whole purpose).

Usage: python tools/homography_impact.py
Prints one JSON document (and is mirrored by
tests/test_flow_runner.py::test_homography_impact_real_photo).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def real_photo():
    import cv2
    import matplotlib

    path = os.path.join(os.path.dirname(matplotlib.__file__),
                        "mpl-data", "sample_data", "grace_hopper.jpg")
    im = cv2.imread(path)  # BGR uint8, 600x512
    assert im is not None, path
    return cv2.resize(im, (512, 384), interpolation=cv2.INTER_AREA)


def video_like_homography(w, h, seed=0):
    """A realistic inter-frame camera motion: small rotation +
    perspective + translation (tens of px at this resolution, like the
    distant hierarchical2 pairs the reference aligns)."""
    rng = np.random.default_rng(seed)
    ang = np.deg2rad(rng.uniform(1.5, 3.0))
    c, s = np.cos(ang), np.sin(ang)
    cx, cy = w / 2, h / 2
    T = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], np.float64)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)
    P = np.eye(3)
    P[2, 0] = rng.uniform(-6e-5, 6e-5)
    P[2, 1] = rng.uniform(-6e-5, 6e-5)
    tx, ty = rng.uniform(8, 18), rng.uniform(-6, 6)
    Tb = np.array([[1, 0, cx + tx], [0, 1, cy + ty], [0, 0, 1]], np.float64)
    return Tb @ P @ R @ T


def corner_error(H_est, H_true, w, h):
    import cv2

    corners = np.float64([[0, 0], [w, 0], [0, h], [w, h]]).reshape(-1, 1, 2)
    a = cv2.perspectiveTransform(corners, H_est)
    b = cv2.perspectiveTransform(corners, H_true)
    return float(np.median(np.linalg.norm(a - b, axis=-1)))


def grid_flow_of_homography(H, w, h):
    """Dense flow field taking frame1 pixels to their H image."""
    import cv2

    X, Y = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    pts = np.stack([X, Y], -1).reshape(-1, 1, 2)
    out = cv2.perspectiveTransform(pts, H).reshape(h, w, 2)
    return (out - np.stack([X, Y], -1)).astype(np.float32)


def main():
    import cv2

    from consistent_depth_tpu.flow.backends import (
        align_homography, compose_homography_flow,
    )

    im1 = real_photo()
    h, w = im1.shape[:2]
    H_true = video_like_homography(w, h, seed=0)
    # frame2 = frame1 seen after the camera motion: pixels of frame2 at
    # x come from frame1 at H^-1 x  =>  warp with WARP_INVERSE_MAP
    im2 = cv2.warpPerspective(
        im1, H_true, (w, h), flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP)

    # interior mask: corners invalidated by the warp
    valid = cv2.warpPerspective(
        np.ones((h, w), np.float32), H_true, (w, h),
        flags=cv2.INTER_NEAREST | cv2.WARP_INVERSE_MAP) > 0.5
    valid &= np.pad(np.ones((h - 64, w - 64), bool), 32)

    H_est, _ = align_homography(im1, im2)
    assert H_est is not None, "SIFT registration failed on the real photo"

    # (1) H recovery
    err_px = corner_error(H_est, H_true, w, h)

    # (2) composed flow through estimated vs true vs no homography,
    # with the IDEAL residual flow for each alignment: residual(p) =
    # H_align^-1 H_true p - p on frame1's grid (what a perfect
    # estimator returns for the aligned pair); identity H = no
    # alignment. compose() then maps all three back to raw frame2.
    def composed(H_align):
        residual = grid_flow_of_homography(
            np.linalg.inv(H_align) @ H_true, w, h)
        return compose_homography_flow(residual, np.linalg.inv(H_align))

    gt = composed(np.eye(3))               # = H_true flow directly
    via_true = composed(H_true)
    via_est = composed(H_est)
    d_true = np.linalg.norm(via_true - gt, axis=-1)[valid]
    d_est = np.linalg.norm(via_est - gt, axis=-1)[valid]

    # (3) the motion FlowNet sees
    raw_motion = np.linalg.norm(
        grid_flow_of_homography(H_true, w, h), axis=-1)[valid]
    resid_motion = np.linalg.norm(grid_flow_of_homography(
        np.linalg.inv(H_est) @ H_true, w, h), axis=-1)[valid]

    report = {
        "image": "matplotlib grace_hopper.jpg (real photograph)",
        "sift_H_corner_err_px_median": round(err_px, 4),
        "composed_flow_delta_px": {
            "via_true_H_median": round(float(np.median(d_true)), 5),
            "via_true_H_p95": round(float(np.percentile(d_true, 95)), 5),
            "via_sift_H_median": round(float(np.median(d_est)), 5),
            "via_sift_H_p95": round(float(np.percentile(d_est, 95)), 5),
        },
        "motion_px_median": {
            "unaligned": round(float(np.median(raw_motion)), 2),
            "after_sift_alignment": round(float(np.median(resid_motion)), 3),
        },
    }
    print(json.dumps(report, indent=1))
    return report


if __name__ == "__main__":
    main()
