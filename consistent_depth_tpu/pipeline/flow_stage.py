"""Optical-flow stage (reference: flow.py).

Responsibilities: compute/import per-pair flow, derive validity masks
(batched on the accelerator), filter pairs by mask overlap, write debug
visualizations. The flow *backend* is pluggable
(:mod:`consistent_depth_tpu.flow`): precomputed files (the parity
default — FlowNet2 weights/CUDA ops are external inputs, SURVEY §2.2)
or a JAX flow network.
"""

from __future__ import annotations

import json
import os
from os.path import join as pjoin
from typing import List, Tuple

import numpy as np

from ..io import image_io
from ..ops import consistency, flow_viz, geometry
from ..ops.resample import sample_uv
from ..utils.helpers import mkdir_ifnotexists

import jax.numpy as jnp


class Flow:
    def __init__(self, path: str, out_path: str):
        self.path = path
        self.out_path = out_path

    @staticmethod
    def max_size() -> int:
        return 1024

    # ------------------------------------------------------------------
    def check_flow_files(self, index_pairs) -> bool:
        flow_dir = pjoin(self.path, "flow")
        return all(
            os.path.exists(pjoin(flow_dir, f"flow_{i:06d}_{j:06d}.raw"))
            for (i, j) in index_pairs
        )

    def compute_flow(self, index_pairs, checkpoint: str = "FlowNet2") -> None:
        """Compute (or verify precomputed) flow for every pair
        (reference: flow.py:96-145)."""
        mkdir_ifnotexists(pjoin(self.path, "flow"))
        if self.check_flow_files(index_pairs):
            return

        from ..flow import create_flow_backend

        tmp = image_io.load_raw_float32_image(
            pjoin(self.path, "color_down", "frame_{:06d}.raw".format(0)))
        size = tmp.shape[:2][::-1]
        print("Resizing flow to", size)

        backend = create_flow_backend(checkpoint)
        frame_dir = pjoin(self.path, "color_flow")
        missing = [p for p in index_pairs if not self.check_flow_files([p])]
        backend.process_pairs(
            frame_dir=frame_dir,
            pairs=missing,
            out_fmt=pjoin(self.path, "flow", "flow_{:06d}_{:06d}.raw"),
            out_size=size,
        )
        if not self.check_flow_files(index_pairs):
            raise RuntimeError(
                "Flow files still missing after backend run. Provide "
                "precomputed flow/ files or a supported flow backend.")

    # ------------------------------------------------------------------
    def mask_valid_correspondences(
        self, flow_thresh: float = 1.0, color_thresh: float = 1.0,
        batch_pairs: int = 16,
    ) -> None:
        """Batched accelerator mask computation
        (reference: flow.py:199-228 loops pairs on host)."""
        import cv2

        flow_fmt = pjoin(self.path, "flow", "flow_{:06d}_{:06d}.raw")
        mask_fmt = pjoin(self.path, "mask", "mask_{:06d}_{:06d}.png")
        color_fmt = pjoin(self.path, "color_down", "frame_{:06d}.raw")

        os.makedirs(os.path.dirname(mask_fmt), exist_ok=True)
        flow_names = os.listdir(os.path.dirname(flow_fmt))

        todo: List[List[int]] = []
        for name in flow_names:
            indices = [int(s) for s in
                       os.path.splitext(name)[0].split("_")[1:]]
            if os.path.isfile(mask_fmt.format(*indices)):
                continue
            if indices[::-1] in todo:
                continue
            todo.append(indices)

        import jax

        def write_out(chunk, masks):
            for pair, mask_pair in zip(chunk, np.asarray(masks)):
                for idxs, mask in zip((pair, pair[::-1]), mask_pair):
                    cv2.imwrite(
                        mask_fmt.format(*idxs),
                        mask.astype(np.uint8) * 255)

        # FIFO-safe pipelining (the tunneled chip serializes every RPC,
        # so a fetch enqueued after the NEXT dispatch would wait for it
        # too): chunk k's host reads overlap compute(k-1); fetch(k-1)
        # happens BEFORE dispatch(k); the PNG writes overlap compute(k)
        pending = None
        for start in range(0, len(todo), batch_pairs):
            chunk = todo[start:start + batch_pairs]
            flows = np.stack([
                np.stack([
                    image_io.load_raw_float32_image(flow_fmt.format(*idxs))
                    for idxs in (pair, pair[::-1])
                ]) for pair in chunk
            ])
            colors = np.stack([
                np.stack([
                    image_io.load_raw_float32_image(color_fmt.format(i))
                    for i in pair
                ]) for pair in chunk
            ])
            fetched = (pending[0], jax.device_get(pending[1])) \
                if pending is not None else None
            masks = consistency.consistent_flow_masks(
                jnp.asarray(flows), jnp.asarray(colors),
                flow_thresh, color_thresh)
            pending = (chunk, masks)
            if fetched is not None:
                write_out(*fetched)
        if pending is not None:
            write_out(pending[0], jax.device_get(pending[1]))

    # ------------------------------------------------------------------
    def check_good_flow_pairs(self, frame_pairs, overlap_ratio: float) -> str:
        """Filter pairs whose masks cover >= overlap_ratio of the image
        (reference: flow.py:46-86)."""
        import cv2

        flow_list_path = pjoin(
            self.out_path, "flow_list_%.2f.json" % overlap_ratio)
        if os.path.isfile(flow_list_path):
            return flow_list_path

        def ratio(mask):
            return np.sum(mask > 0) / np.prod(mask.shape[:2])

        mask_fmt = pjoin(self.path, "mask", "mask_{:06d}_{:06d}.png")
        result_pairs: List[Tuple[int, int]] = []
        checked = set()
        for pair in frame_pairs:
            pair = tuple(pair)
            if pair in checked:
                continue
            cur_pairs = [pair, pair[::-1]]
            checked.update(cur_pairs)
            ratios = [
                ratio(cv2.imread(mask_fmt.format(*ids), 0))
                for ids in cur_pairs
            ]
            if all(r >= overlap_ratio for r in ratios):
                result_pairs.extend(cur_pairs)
            else:
                print(f"Bad frame pair({pair[0]}, {pair[1]}). "
                      f"Overlap_ratio=", ratios)

        print(f"Filtered {len(result_pairs)} / {len(frame_pairs)} "
              "good frame pairs")
        if not result_pairs:
            raise Exception("No good frame pairs are found.")

        dists = np.array([abs(i - j) for (i, j) in result_pairs])
        print("Frame distance statistics: "
              f"max = {dists.max()}, mean = {dists.mean():.0f}, "
              f"median = {np.median(dists):.0f}")
        with open(flow_list_path, "w") as f:
            json.dump([list(p) for p in result_pairs], f)
        return flow_list_path

    # ------------------------------------------------------------------
    def visualize_flow(self, warp: bool = False,
                       batch_pairs: int = 16) -> None:
        """(reference: flow.py:147-197 — a per-pair host loop there)

        TPU redesign: wheel rendering, mask overlays, panel composition
        and flow warps for a whole chunk of pairs run as ONE jitted
        device program; the host only reads inputs and writes PNGs.
        (The per-image float64 numpy loop took ~0.4 s/pair on this
        1-core host — ~10 min for a demo-sized video.)"""
        import cv2
        import jax

        flow_fmt = pjoin(self.path, "flow", "flow_{:06d}_{:06d}.raw")
        mask_fmt = pjoin(self.path, "mask", "mask_{:06d}_{:06d}.png")
        color_fmt = pjoin(self.path, "color_down", "frame_{:06d}.raw")
        vis_fmt = pjoin(self.path, "vis_flow", "frame_{:06d}_{:06d}.png")
        warp_fmt = pjoin(
            self.path, "vis_flow_warped", "frame_{:06d}_{:06d}_warped.png")

        for fmt in (vis_fmt, warp_fmt):
            os.makedirs(os.path.dirname(fmt), exist_ok=True)

        todo = []
        for flow_name in os.listdir(os.path.dirname(flow_fmt)):
            indices = sorted(
                int(s) for s in os.path.splitext(flow_name)[0].split("_")[1:])
            if indices in todo:
                continue
            if os.path.isfile(vis_fmt.format(*indices)) and (
                not warp or os.path.isfile(warp_fmt.format(*indices))
            ):
                continue
            todo.append(indices)
        if not todo:
            return

        @jax.jit
        def render(flows, colors, masks):
            # flows/colors/masks: (B, 2, H, W, {2,3,1}); colors 0..255
            B, _, H, W = flows.shape[:4]
            flow_ims = flow_viz.flow_to_image_jnp(
                flows.reshape(B * 2, H, W, 2)).reshape(B, 2, H, W, 3)
            green = jnp.asarray([0.0, 255.0, 0.0])
            keep = masks > 0          # (B, 2, H, W, 1)

            def overlay(im, d):
                return 0.7 * im + 0.3 * ((1 - keep[:, d]) * green)

            # panel layout matches the reference: top row originals,
            # bottom row mask overlays; columns [color_i, color_j,
            # flow_ij, flow_ji]; mask_ij applies to color_i/flow_ij
            original = jnp.concatenate(
                [colors[:, 0], colors[:, 1], flow_ims[:, 0], flow_ims[:, 1]],
                axis=2)
            masked = jnp.concatenate(
                [overlay(colors[:, 0], 0), overlay(colors[:, 1], 1),
                 overlay(flow_ims[:, 0], 0), overlay(flow_ims[:, 1], 1)],
                axis=2)
            panel = jnp.concatenate([original, masked], axis=1)

            # uint8 on device: the fetch is the bottleneck on a
            # tunneled chip (f32 panels are 4x the bytes)
            to_u8 = lambda x: jnp.clip(x, 0, 255).astype(jnp.uint8)  # noqa: E731
            if not warp:   # static: no warp compute or fetch at all
                return (to_u8(panel),)
            pixels = geometry.pixel_grid((H, W))
            uv = pixels + flows.reshape(B * 2, H, W, 2)
            src = jnp.stack([colors[:, 1], colors[:, 0]], axis=1)
            warped = sample_uv(src.reshape(B * 2, H, W, 3), uv)
            return to_u8(panel), to_u8(warped)

        def write_out(chunk, panel, warped=None):
            panel = np.asarray(panel)
            for k, pair in enumerate(chunk):
                cv2.imwrite(vis_fmt.format(*pair), panel[k])
                if warp:
                    for s, idxs in enumerate((pair, pair[::-1])):
                        cv2.imwrite(warp_fmt.format(*idxs),
                                    np.asarray(warped)[2 * k + s])

        # FIFO-safe pipelining (see mask_valid_correspondences): host
        # reads overlap the previous render; the fetch precedes the
        # next dispatch; PNG writes overlap the current render
        pending = None
        for start in range(0, len(todo), batch_pairs):
            chunk = todo[start:start + batch_pairs]
            flows = np.stack([
                np.stack([
                    image_io.load_raw_float32_image(flow_fmt.format(*idxs))
                    for idxs in (pair, pair[::-1])
                ]) for pair in chunk
            ])
            colors = np.stack([
                np.stack([
                    image_io.load_raw_float32_image(color_fmt.format(i)) * 255
                    for i in pair
                ]) for pair in chunk
            ])
            masks = np.stack([
                np.stack([
                    cv2.imread(mask_fmt.format(*idxs), 0)
                    for idxs in (pair, pair[::-1])
                ]) for pair in chunk
            ]).astype(np.float32)[..., None]
            fetched = ((pending[0],) + tuple(jax.device_get(pending[1:]))
                       if pending is not None else None)
            out = render(
                jnp.asarray(flows), jnp.asarray(colors), jnp.asarray(masks))
            pending = (chunk,) + tuple(out)
            if fetched is not None:
                write_out(*fetched)
        if pending is not None:
            write_out(pending[0], *jax.device_get(pending[1:]))
