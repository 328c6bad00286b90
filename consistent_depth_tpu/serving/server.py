"""Batched multi-video depth serving.

The reference processes one video at a time through a test loop
(reference: depth_fine_tuning.py:164-199 is the closest thing to an
inference path). This module is the production-serving counterpart,
designed TPU-first:

- frames from MANY videos share one compiled program: requests are
  micro-batched into a static ``(B, 1, H, W, 3)`` shape per resolution
  bucket, so XLA compiles once per bucket and the MXU always sees a
  full batch regardless of how ragged the request stream is;
- double-buffered dispatch: batch k+1 is enqueued while batch k's
  result is still in flight, hiding host IO and fetch latency under
  device compute (same pattern as
  :meth:`training.fine_tuning.DepthFineTuner.save_depth`);
- under a :class:`jax.sharding.Mesh` the batch axis is sharded over
  the data axis, scaling serving throughput across chips with no code
  changes (params replicated, XLA inserts the transfers).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.registry import create_depth_model
from ..parallel.mesh import DATA_AXIS


@dataclass
class ServeConfig:
    """Configuration for a :class:`DepthServer`."""

    model_type: str = "mc"
    checkpoint: Optional[str] = None
    precision: str = "bf16"
    batch_size: int = 8
    mesh: Optional[Mesh] = None
    # latency bound for ragged streams: flush a partially-filled
    # resolution bucket (padded) once this many requests for OTHER
    # buckets have arrived since it last grew. None = only flush full
    # buckets / end of stream (max throughput, unbounded latency).
    flush_max_wait: Optional[int] = None
    # dispatch pipeline depth: how many micro-batches may be in flight
    # before the oldest result is fetched. 1 = double buffering (launch
    # k+1, then fetch k); deeper helps only when host fetch latency
    # exceeds a whole batch's compute.
    max_in_flight: int = 1
    # extra kwargs forwarded to the backbone constructor
    model_kwargs: Dict[str, Any] = field(default_factory=dict)


def _align_up(x: int, align: int) -> int:
    return -(-x // align) * align


class DepthServer:
    """Serves eval-mode depth inference for a stream of frames that may
    come from many different videos (and resolutions) at once.

    Programs are compiled lazily, one per ``(H, W)`` resolution bucket;
    frames whose size is not aligned to the backbone's requirement are
    edge-padded up and the depth cropped back, so callers never see the
    alignment constraint.
    """

    def __init__(self, config: ServeConfig,
                 model: Optional[Any] = None):
        from ..models import layers

        layers.set_compute_dtype(
            jnp.bfloat16 if config.precision == "bf16" else None)
        self.config = config
        self.model = model if model is not None else create_depth_model(
            config.model_type, checkpoint=config.checkpoint,
            **config.model_kwargs)
        self.align = self.model.align
        self.variables = self.model.variables
        if config.mesh is not None:
            self.variables = jax.device_put(
                self.variables, NamedSharding(config.mesh, P()))
        self._programs: Dict[Tuple[int, int], Any] = {}

    # -- compiled program per resolution bucket ------------------------
    def _program(self, shape: Tuple[int, int]):
        if shape not in self._programs:
            # under the bf16 compute policy the host-bound depth travels
            # as f16 (same convention as engine.eval_epoch: the compute
            # noise is ~4e-3 relative, f16 adds 1e-3, and the transfer
            # is the serving bottleneck on thin host links)
            out_dt = (jnp.float16 if self.config.precision == "bf16"
                      else jnp.float32)

            def infer(variables, images):
                depth, _ = self.model.apply(variables, images, train=False)
                return depth.astype(out_dt)

            if self.config.mesh is None:
                self._programs[shape] = jax.jit(infer)
            else:
                mesh = self.config.mesh
                self._programs[shape] = jax.jit(
                    infer,
                    in_shardings=(NamedSharding(mesh, P()),
                                  NamedSharding(mesh, P(DATA_AXIS))),
                    out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
                )
        return self._programs[shape]

    def _bucket_of(self, h: int, w: int) -> Tuple[int, int]:
        return _align_up(h, self.align), _align_up(w, self.align)

    def _dispatch(self, frames: List[np.ndarray],
                  bucket: Tuple[int, int]) -> jnp.ndarray:
        """Pad ``frames`` (each (h, w, 3)) to the bucket shape and the
        static batch size, then launch the bucket's program. Returns the
        in-flight device array — NOT fetched."""
        B = self.config.batch_size
        bh, bw = bucket
        batch = np.zeros((B, 1, bh, bw, 3), np.float32)
        for i, f in enumerate(frames):
            h, w = f.shape[:2]
            batch[i, 0, :h, :w] = f
            # edge-pad so the conv receptive fields at the crop border
            # see plausible content rather than zeros
            if h < bh:
                batch[i, 0, h:] = batch[i, 0, h - 1:h]
            if w < bw:
                batch[i, 0, :, w:] = batch[i, 0, :, w - 1:w]
        return self._program(bucket)(self.variables, jnp.asarray(batch))

    # -- synchronous batched API ---------------------------------------
    def infer_frames(self, frames: np.ndarray) -> np.ndarray:
        """Eval-mode depth for ``frames`` (N, H, W, 3) BGR [0, 1] ->
        (N, H, W) depth. Batches of ``config.batch_size`` are
        double-buffered: batch k+1 is dispatched before batch k's
        result is fetched."""
        results = [
            d for _, d in self.serve(
                ((i, f) for i, f in enumerate(np.asarray(frames))))
        ]
        return np.stack(results)

    # -- streaming multi-video API -------------------------------------
    def serve(self, requests: Iterable[Tuple[Any, np.ndarray]],
              ) -> Iterator[Tuple[Any, np.ndarray]]:
        """Serve a stream of ``(key, frame)`` requests — frames may come
        from different videos and have different resolutions — yielding
        ``(key, depth)`` as micro-batches complete.

        Frames are grouped into per-resolution buckets; a bucket is
        flushed when it reaches the static batch size, when it has
        waited ``config.flush_max_wait`` foreign requests (latency
        bound for ragged streams — a padded flush trades MXU
        utilization for tail latency), and at end of stream. Order
        within a bucket is preserved; across buckets results arrive in
        flush order. Up to ``config.max_in_flight`` micro-batches stay
        in flight before the oldest is fetched.
        """
        from collections import deque

        pending: Dict[Tuple[int, int], List[Tuple[Any, np.ndarray]]] = {}
        # requests seen at the time the bucket last grew (staleness probe)
        last_grew: Dict[Tuple[int, int], int] = {}
        in_flight: deque = deque()
        n_seen = 0
        max_if = max(1, self.config.max_in_flight)

        def launch(bucket):
            group = pending.pop(bucket)
            last_grew.pop(bucket, None)
            keys = [k for k, _ in group]
            sizes = [f.shape[:2] for _, f in group]
            depth = self._dispatch([f for _, f in group], bucket)
            in_flight.append((depth, keys, sizes))
            if len(in_flight) > max_if:
                return in_flight.popleft()
            return None

        def fetch(flight):
            depth, keys, sizes = flight
            depth = np.asarray(jax.device_get(depth)).astype(
                np.float32)[:, 0]
            for i, (key, (h, w)) in enumerate(zip(keys, sizes)):
                yield key, depth[i, :h, :w]

        wait = self.config.flush_max_wait
        for key, frame in requests:
            frame = np.asarray(frame, np.float32)
            bucket = self._bucket_of(*frame.shape[:2])
            pending.setdefault(bucket, []).append((key, frame))
            n_seen += 1
            last_grew[bucket] = n_seen
            if len(pending[bucket]) == self.config.batch_size:
                done = launch(bucket)
                if done is not None:
                    yield from fetch(done)
            if wait is not None:
                stale = [b for b, at in last_grew.items()
                         if n_seen - at >= wait]
                for b in stale:
                    done = launch(b)
                    if done is not None:
                        yield from fetch(done)
        for bucket in sorted(pending):
            done = launch(bucket)
            if done is not None:
                yield from fetch(done)
        while in_flight:
            yield from fetch(in_flight.popleft())

    # -- convenience ----------------------------------------------------
    def infer_videos(self, videos: Dict[Any, np.ndarray],
                     ) -> Dict[Any, np.ndarray]:
        """Serve whole videos at once: ``{video_id: (N, H, W, 3)}`` ->
        ``{video_id: (N, H, W)}``. Frames of all videos are interleaved
        into shared batches (same-resolution videos share programs and
        padding waste is amortized across the fleet)."""

        def gen():
            iters = {
                vid: enumerate(np.asarray(v)) for vid, v in videos.items()
            }
            while iters:
                for vid in list(iters):
                    try:
                        i, frame = next(iters[vid])
                        yield (vid, i), frame
                    except StopIteration:
                        del iters[vid]

        out = {
            vid: np.zeros(np.asarray(v).shape[:3], np.float32)
            for vid, v in videos.items()
        }
        for (vid, i), depth in self.serve(gen()):
            out[vid][i] = depth
        return out
