"""Checkpointing beyond the reference's model-only ``.pth`` files.

The reference restarts fine-tuning from epoch 0 on every run — there is
no optimizer-state resume (SURVEY §5). This module adds full-state
resumable checkpoints (params + batch stats + Adam moments + step +
epoch), alongside the ``.pth`` exports kept for reference-tooling
parity.

Format: the state pytree is flattened and stored leaf-by-leaf in a
single ``state.npz`` (restore rebuilds against a template treedef, so
arbitrary pytrees — optax namedtuple states included — round-trip).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from .engine import TrainState


def save_full_state(path: str, state: TrainState, epoch: int) -> None:
    """Write a resumable checkpoint directory."""
    state = jax.device_get(state)
    os.makedirs(path, exist_ok=True)
    flat, _ = jax.tree_util.tree_flatten(
        {"state": state._asdict(), "epoch": np.int64(epoch)})
    tmp = os.path.join(path, "state_tmp.npz")
    np.savez(tmp, **{str(i): np.asarray(x) for i, x in enumerate(flat)})
    os.replace(tmp, os.path.join(path, "state.npz"))


def restore_full_state(
    path: str, template_state: TrainState
) -> Optional[Tuple[TrainState, int]]:
    """Restore a checkpoint written by :func:`save_full_state`;
    returns None if absent. ``template_state`` supplies the treedef."""
    fn = os.path.join(path, "state.npz")
    if not os.path.isfile(fn):
        return None
    template = {"state": jax.device_get(template_state)._asdict(),
                "epoch": np.int64(0)}
    flat_t, treedef = jax.tree_util.tree_flatten(template)
    with np.load(fn) as data:
        if len(data.files) != len(flat_t):
            raise ValueError(
                f"checkpoint at {path} has {len(data.files)} leaves, "
                f"template has {len(flat_t)} — incompatible state")
        flat = [data[str(i)] for i in range(len(flat_t))]
    restored = jax.tree_util.tree_unflatten(treedef, flat)
    state = TrainState(**restored["state"])
    return state, int(restored["epoch"])


def latest_epoch_checkpoint(checkpoints_dir: str) -> Optional[Tuple[str, int]]:
    """Find the newest full-state checkpoint dir ``full_{epoch:04d}``."""
    if not os.path.isdir(checkpoints_dir):
        return None
    best = None
    for name in os.listdir(checkpoints_dir):
        if name.startswith("full_") and name[5:].isdigit():
            epoch = int(name[5:])
            if best is None or epoch > best[1]:
                best = (os.path.join(checkpoints_dir, name), epoch)
    return best
