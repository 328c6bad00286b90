"""Full-state checkpoint save/restore round-trip."""

import numpy as np

import jax
import jax.numpy as jnp

from consistent_depth_tpu.training import checkpoints as ckpt
from consistent_depth_tpu.training.engine import TrainState


def _state():
    rng = np.random.default_rng(0)
    params = {"a": jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32)),
              "nested": {"b": jnp.asarray(rng.standard_normal(5)
                                          .astype(np.float32))}}
    import optax

    tx = optax.adam(1e-3)
    return TrainState(
        params=params,
        batch_stats={"bn": {"mean": jnp.zeros(4), "var": jnp.ones(4)}},
        opt_state=tx.init(params),
        step=jnp.asarray(7, jnp.int32),
    )


def test_roundtrip(tmp_path):
    state = _state()
    path = str(tmp_path / "full_0003")
    ckpt.save_full_state(path, state, epoch=3)
    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored, epoch = ckpt.restore_full_state(path, zero)
    assert epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_epoch(tmp_path):
    state = _state()
    for e in (1, 3, 2):
        ckpt.save_full_state(str(tmp_path / f"full_{e:04d}"), state, e)
    latest = ckpt.latest_epoch_checkpoint(str(tmp_path))
    assert latest is not None and latest[1] == 3
    assert ckpt.latest_epoch_checkpoint(str(tmp_path / "nope")) is None
