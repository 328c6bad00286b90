"""Epoch-level lax.scan path must match sequential train steps."""

import numpy as np

import jax

import synthetic
from consistent_depth_tpu.models.mannequin_challenge import MannequinChallengeModel
from consistent_depth_tpu.ops.losses import LossWeights
from consistent_depth_tpu.training import TrainingEngine, create_optimizer
import pytest

pytestmark = pytest.mark.slow  # compile-heavy


def test_epoch_scan_matches_sequential_steps():
    scene = synthetic.make_scene(num_frames=4, H=16, W=32)
    data = synthetic.build_pair_arrays(scene, synthetic.make_pairs(4))
    idx_mat = np.array([[0, 1], [2, 3], [4, 0]], np.int32)
    valid_mat = np.ones((3, 2), np.float32)

    def make_engine():
        return TrainingEngine(
            MannequinChallengeModel(checkpoint="", seed=0),
            create_optimizer("Adam", 4e-4), LossWeights())

    e1 = make_engine()
    s1 = e1.init_state()
    d1 = e1.put_data(data)
    seq_losses = []
    for k in range(3):
        s1, m = e1.train_step(s1, d1, idx_mat[k], valid_mat[k])
        seq_losses.append(float(m["loss"]))

    e2 = make_engine()
    s2 = e2.init_state()
    d2 = e2.put_data(data)
    s2, m2 = e2.train_epoch(s2, d2, idx_mat, valid_mat)

    # step 0 is bit-comparable and step 1 (one Adam update apart) is
    # near-tight; step 2 compounds fp differences through train-mode BN
    # sigma conditioning on this tiny random-init scene (scan fuses
    # reductions differently), same phenomenon as the mesh-parity test —
    # so the trajectory check is loose while the one-step checks and the
    # end-of-epoch parameter distance stay strict enough to catch logic
    # (not rounding) divergence
    np.testing.assert_allclose(
        float(m2["loss"][0]), seq_losses[0], rtol=1e-6)
    np.testing.assert_allclose(
        float(m2["loss"][1]), seq_losses[1], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(m2["loss"]), seq_losses, rtol=8e-2)
    assert int(s2.step) == 3
    va = np.concatenate([np.ravel(x) for x in
                         jax.tree_util.tree_leaves(jax.device_get(s1.params))])
    vb = np.concatenate([np.ravel(x) for x in
                         jax.tree_util.tree_leaves(jax.device_get(s2.params))])
    assert np.linalg.norm(va - vb) / np.linalg.norm(va) < 5e-2
