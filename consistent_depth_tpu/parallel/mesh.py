"""Device mesh + sharding policy.

The reference's only multi-device mechanism is ``torch.nn.DataParallel``
on one adapter plus batch-size scaling (SURVEY §2.3). Here data
parallelism is first-class and TPU-native:

- a 1-D ``jax.sharding.Mesh`` over all chips, axis ``"data"``;
- the frame-pair batch axis is sharded over ``"data"``; params,
  optimizer state, and the device-resident dataset are replicated;
- gradients are reduced by the ``psum`` XLA inserts for the replicated
  output sharding — collectives ride ICI, no host involvement;
- per-pair eval losses are tiny, so gathering them back is free.

Scaling axis: #frame pairs (the sequence-length analog of this system —
SURVEY §5), which data parallelism covers; the CNN backbones (~100M
params max) need no tensor/pipeline parallelism.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data-parallel mesh over the pod slice (or a subset)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    spec = P(DATA_AXIS, *([None] * (rank - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree_batch(mesh: Mesh, tree):
    """device_put a pytree with every leaf's leading axis sharded."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), tree
    )


def put_replicated(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated_sharding(mesh)), tree
    )
