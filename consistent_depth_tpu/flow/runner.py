"""Native flow runner (reference: optical_flow_flownet2_homography.py).

For each frame pair: optionally register frame2 onto frame1 with a
feature homography (RANSAC), run the flow network on the (aligned)
pair at a 64-multiple resolution, compose the homography back into the
flow, and resize to the depth resolution. The KITTI-checkpoint path
skips the homography, as in the reference (flow.py:97-98, 139).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..io import image_io
from .backends import (FlowBackend, align_homography,
                       compose_homography_flow, resize_flow)
from .flownet import FlowNet2, FlowNet2CSS


def _round64(v: int) -> int:
    return max(64, int(round(v / 64)) * 64)


class JaxFlowBackend(FlowBackend):
    """Runs a JAX flow network on TPU: the full FlowNet2
    (C->S->S + SD + fusion, like the reference's released checkpoint —
    optical_flow_flownet2_homography.py:246-252) when the checkpoint
    carries the SD/fusion weights, else the C->S->S cascade."""

    name = "jax-flownet"

    def __init__(self, variables=None, checkpoint: Optional[str] = None,
                 homography: bool = True, seed: int = 0,
                 full: Optional[bool] = None):
        self.homography = homography
        sd = None
        if variables is None and checkpoint and os.path.isfile(checkpoint):
            from ..models import torch_import

            sd = torch_import.load_torch_checkpoint(checkpoint)
        # the released FlowNet2 checkpoint spells the cascade stages
        # "flownets_1." (module attributes); our own .pth export writes
        # "flownets.1." (torch_import's generic name_index convention).
        # Both spellings import to the same flax path — normalize only
        # for the prefix checks below.
        def _norm(k: str) -> str:
            return k.replace("flownets.", "flownets_")

        if full is None:
            # auto-select: use the full net exactly when its branches
            # have weights to load
            full = sd is not None and any(
                _norm(k).startswith(("flownets_d.", "flownetfusion."))
                for k in sd)
        self.module = FlowNet2() if full else FlowNet2CSS()
        if variables is None:
            if sd is not None:
                keep = ("flownetc.", "flownets_1.", "flownets_2.")
                if full:
                    keep += ("flownets_d.", "flownetfusion.")
                sd = {k: v for k, v in sd.items()
                      if _norm(k).startswith(keep)}
                template = self._init(seed)
                variables = torch_import.state_dict_to_variables(
                    sd, template, strict=False)
            else:
                if checkpoint:
                    print(f"[JaxFlowBackend] checkpoint '{checkpoint}' not "
                          "found — using random initialization")
                variables = self._init(seed)
        self.variables = jax.tree_util.tree_map(jnp.asarray, variables)
        self._apply = jax.jit(self.module.apply)

    def _init(self, seed: int):
        x = jnp.zeros((1, 64, 64, 3))
        return self.module.init(jax.random.PRNGKey(seed), x, x)

    def compute_pair(self, im1: np.ndarray, im2: np.ndarray) -> np.ndarray:
        """RGB images (H, W, 3) in [0, 1] -> flow (H, W, 2) pixels
        (at the network resolution, i.e. the input resolution rounded
        to 64)."""
        H, W = im1.shape[:2]
        Hn, Wn = _round64(H), _round64(W)

        homo = None
        im2_in = im2
        if self.homography:
            homo, im2_in = align_homography(im1, im2)

        import cv2

        def prep(im):
            if (im.shape[0], im.shape[1]) != (Hn, Wn):
                im = cv2.resize(im, (Wn, Hn), interpolation=cv2.INTER_LINEAR)
            return jnp.asarray(im[None].astype(np.float32))

        flow = np.asarray(self._apply(
            self.variables, prep(im1), prep(im2_in))[0])
        if (Hn, Wn) != (H, W):
            flow = resize_flow(flow, (W, H))
        if homo is not None:
            flow = compose_homography_flow(flow, homo)
        return flow

    def process_pairs(self, frame_dir: str,
                      pairs: Sequence[Tuple[int, int]],
                      out_fmt: str, out_size: Tuple[int, int]) -> None:
        import cv2

        for (i, j) in pairs:
            out_fn = out_fmt.format(i, j)
            if os.path.isfile(out_fn):
                continue
            im1 = cv2.imread(
                os.path.join(frame_dir, f"frame_{i:06d}.png"))[..., ::-1] / 255.0
            im2 = cv2.imread(
                os.path.join(frame_dir, f"frame_{j:06d}.png"))[..., ::-1] / 255.0
            flow = self.compute_pair(
                im1.astype(np.float32), im2.astype(np.float32))
            image_io.save_raw_float32_image(
                out_fn, resize_flow(flow, out_size))


def main(argv: Optional[Sequence[str]] = None) -> None:
    """Standalone flow CLI (reference:
    optical_flow_flownet2_homography.py:108-271): compute flow from
    each --im1[i] to --im2[i], save .raw (and optionally a color-wheel
    PNG) at --out[i]. Existing outputs are skipped, like every other
    stage."""
    import argparse

    parser = argparse.ArgumentParser(
        "Compute optical flow from im1 to im2")
    parser.add_argument("--im1", nargs="+", required=True)
    parser.add_argument("--im2", nargs="+", required=True)
    parser.add_argument("--out", nargs="+", required=True)
    parser.add_argument("--checkpoint", type=str, default="",
                        help="FlowNet2 .pth/.pth.tar state dict; random "
                        "init when absent (useful only for smoke runs)")
    parser.add_argument("--homography", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="pre-align im2 onto im1 with a RANSAC "
                        "feature homography before the network")
    parser.add_argument("--size", type=int, nargs=2, default=None,
                        metavar=("H", "W"),
                        help="resize the output flow to (H, W)")
    parser.add_argument("--visualize", action="store_true",
                        help="also write a color-wheel PNG next to "
                        "each .raw output")
    args = parser.parse_args(argv)
    if not (len(args.im1) == len(args.im2) == len(args.out)):
        parser.error("--im1/--im2/--out must have equal lengths")

    import cv2

    backend = JaxFlowBackend(
        checkpoint=args.checkpoint, homography=args.homography)
    for im1_fn, im2_fn, out_fn in zip(args.im1, args.im2, args.out):
        if os.path.isfile(out_fn):
            continue
        im1 = cv2.imread(im1_fn)[..., ::-1].astype(np.float32) / 255.0
        im2 = cv2.imread(im2_fn)[..., ::-1].astype(np.float32) / 255.0
        flow = backend.compute_pair(im1, im2)
        if args.size is not None:
            flow = resize_flow(flow, (args.size[1], args.size[0]))
        d = os.path.dirname(out_fn)
        if d:
            os.makedirs(d, exist_ok=True)
        image_io.save_raw_float32_image(out_fn, flow)
        if args.visualize:
            from ..ops.flow_viz import flow_to_image

            cv2.imwrite(os.path.splitext(out_fn)[0] + ".png",
                        flow_to_image(flow)[..., ::-1])


if __name__ == "__main__":
    main()
