"""Depth-model abstraction (reference: monodepth/depth_model.py).

A backbone adapter owns a flax module + its variables and exposes a
*pure* ``apply`` suitable for jit:

    apply(variables, images, train) -> (depth, mutated_batch_stats)

with images (B, N, H, W, 3) BGR in [0, 1] and depth (B, N, H, W)
(depth, not disparity). Stateful convenience wrappers mirror the
reference API (forward / estimate_depth / save) for pipeline use; the
training engine uses the pure function directly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FlaxVars = Dict[str, Any]


class DepthModel:
    # per-backbone requirements/defaults (reference adapters define these
    # as class attributes consumed by params.py:110-119)
    align: int = 1
    learning_rate: float = 1e-4
    lambda_view_baseline: float = 1.0
    # key into utils.url_helpers.MODEL_URLS for the published pretrained
    # checkpoint (reference adapters download on construction, e.g.
    # mannequin_challenge_model.py:29-32); None = no published weights
    checkpoint_url_key: Optional[str] = None

    def __init__(self, variables: Optional[FlaxVars] = None,
                 checkpoint: Optional[str] = None, seed: int = 0):
        self.module = self._make_module()
        if variables is None:
            variables = self._init_variables(seed)
            if checkpoint and not os.path.exists(checkpoint):
                fetched = self._maybe_fetch_checkpoint(checkpoint)
                checkpoint = fetched or checkpoint
            # exists, not isfile: monodepth2's released checkpoint is a
            # DIRECTORY (encoder.pth + depth.pth)
            if checkpoint and os.path.exists(checkpoint):
                variables = self._load_checkpoint(checkpoint, variables)
            elif checkpoint:
                print(f"[{type(self).__name__}] checkpoint '{checkpoint}' "
                      "not found — using random initialization. Drop the "
                      "published weights at that path (or set "
                      "CDTPU_CHECKPOINT_DIR) to load them.")
        self.variables = jax.tree_util.tree_map(jnp.asarray, variables)

    def _default_checkpoint_path(self) -> Optional[str]:
        """The adapter's default checkpoint path, relocated under
        CDTPU_CHECKPOINT_DIR when that is set (same cache resolution as
        the flow backend, flow/backends.py:141). ``default_checkpoint``
        class attributes are relative to the stock ``checkpoints/``
        cache dir."""
        default = getattr(self, "default_checkpoint", None)
        if default is None:
            return None
        ckpt_dir = os.environ.get("CDTPU_CHECKPOINT_DIR")
        if ckpt_dir:
            return os.path.join(ckpt_dir, os.path.basename(default))
        return default

    def _maybe_fetch_checkpoint(self, checkpoint: str) -> Optional[str]:
        """Download the published weights on a default-checkpoint miss
        (reference behavior: adapters fetch on construction via
        utils/url_helpers.py:10-34). Only the adapter's own default path
        triggers a fetch — an explicit user path that doesn't exist is
        left alone so the miss message names it. Offline failures fall
        back to random init with the manual-drop instructions; set
        CDTPU_NO_FETCH=1 to skip the attempt entirely."""
        key = self.checkpoint_url_key
        if (key is None
                or checkpoint != self._default_checkpoint_path()
                or os.environ.get("CDTPU_NO_FETCH")):
            return None
        from ..utils import url_helpers

        try:
            return url_helpers.fetch_model(key)
        except Exception as e:
            print(f"[{type(self).__name__}] checkpoint fetch failed: {e}")
            return None

    # -- to be provided by subclasses -------------------------------------
    def _make_module(self):
        raise NotImplementedError

    def _init_variables(self, seed: int) -> FlaxVars:
        raise NotImplementedError

    def _load_checkpoint(self, path: str, template: FlaxVars) -> FlaxVars:
        from . import torch_import

        sd = torch_import.load_torch_checkpoint(path)
        sd = {k: v for k, v in sd.items() if isinstance(v, np.ndarray)}
        return torch_import.state_dict_to_variables(sd, template)

    def estimate_depth_pure(
        self, variables: FlaxVars, images: jnp.ndarray, train: bool
    ) -> Tuple[jnp.ndarray, FlaxVars]:
        """Pure: (B, N, H, W, 3) -> ((B, N, H, W) depth, mutated stats)."""
        raise NotImplementedError

    # -- shared API -------------------------------------------------------
    def apply(
        self,
        variables: FlaxVars,
        images: jnp.ndarray,
        scales: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, FlaxVars]:
        """Pure forward incl. the optional per-frame scale transform
        (reference: monodepth/depth_model.py:12-30).

        Args:
            images: (B, N, H, W, 3) BGR [0, 1]
            scales: optional (B, N) or (B, N, 1) depth multipliers
        """
        from .layers import compute_dtype

        dtype = compute_dtype()
        if dtype is not None:
            images = images.astype(dtype)
        depth, mutated = self.estimate_depth_pure(variables, images, train)
        depth = depth.astype(jnp.float32)
        if scales is not None:
            depth = depth * scales.reshape(scales.shape[0], scales.shape[1], 1, 1)
        return depth, mutated

    def forward(self, images, metadata=None, train: bool = True):
        """Stateful convenience (updates self.variables' batch stats)."""
        scales = None
        if metadata is not None and "scales" in metadata:
            scales = jnp.asarray(metadata["scales"])
        depth, mutated = self.apply(
            self.variables, jnp.asarray(images), scales=scales, train=train)
        if train and mutated:
            self.variables = {**self.variables, **mutated}
        return depth

    def parameters(self) -> FlaxVars:
        return self.variables["params"]

    def save(self, file_name: str) -> None:
        """Write a torch-layout .pth checkpoint (reference writes raw
        state_dicts: depth_fine_tuning.py:302-304)."""
        from . import torch_import

        torch_import.save_torch_checkpoint(
            file_name, jax.device_get(self.variables))
