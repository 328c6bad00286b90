"""TrainingEngine integration with the non-flagship backbones.

test_engine.py covers the MC hourglass; these smokes run a scanned
train epoch + eval epoch through MiDaS v2 and Monodepth2 (the two
other model families the CLI exposes), exercising their feed-resize /
normalization paths inside the compiled step.
"""

import numpy as np
import pytest

import jax

import synthetic
from consistent_depth_tpu.ops.losses import LossWeights
from consistent_depth_tpu.training import TrainingEngine, create_optimizer

pytestmark = pytest.mark.slow  # compile-heavy


def _monodepth2():
    from consistent_depth_tpu.models.monodepth2 import Monodepth2Model

    # small feed keeps the bicubic feed-resize path active but cheap
    return Monodepth2Model(checkpoint="", feed_size=(32, 64))


def _midas2():
    from consistent_depth_tpu.models.midas_v2 import MidasV2Model

    model = MidasV2Model(checkpoint="")
    # a randomly-initialized MiDaS emits ReLU'd ~zero disparity, and the
    # adapter's depth = 1/disparity (the reference's unprotected
    # `.reciprocal()`, midas_v2_model.py:66-68) then NaNs the loss —
    # with real weights this doesn't happen. Bias the final conv
    # positive so the smoke exercises a *productive* step; the NaN-skip
    # path is asserted separately below.
    params = model.variables["params"]
    bias = params["scratch_output_conv_4"]["bias"]
    params["scratch_output_conv_4"]["bias"] = bias + 5.0
    return model


@pytest.mark.parametrize("make_model", [_monodepth2, _midas2],
                         ids=["monodepth2", "midas2"])
def test_train_and_eval_epoch(make_model):
    model = make_model()
    scene = synthetic.make_scene(num_frames=4, H=32, W=64)
    data = synthetic.build_pair_arrays(scene, synthetic.make_pairs(4))

    # tiny lr: with random-init weights a production-size step can push
    # the ReLU'd disparity output to exact zero and NaN the next
    # forward (real checkpoints don't sit at that boundary)
    engine = TrainingEngine(
        model, create_optimizer("Adam", 1e-6),
        LossWeights(lambda_view_baseline=0.1, lambda_reprojection=1.0),
        precision="f32")
    state = engine.init_state()
    dev = engine.put_data(data)

    P = data["pair_ids"].shape[0]
    B = 2
    S = P // B
    idx = np.arange(S * B, dtype=np.int32).reshape(S, B)
    valid = np.ones((S, B), np.float32)

    p0 = jax.device_get(jax.tree_util.tree_leaves(state.params)[0])
    state, metrics = engine.train_epoch(state, dev, idx, valid)
    losses = np.asarray(metrics["loss"])
    assert losses.shape == (S,) and np.isfinite(losses).all(), losses
    assert int(state.step) == S
    p1 = jax.device_get(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.allclose(p0, p1), "params did not update"

    state, em = engine.eval_epoch(state, dev, idx, valid)
    assert np.isfinite(np.asarray(em["loss"])).all()
    depth = np.asarray(em["depth_frames"])
    assert depth.shape == (4, 32, 64)
    seen = np.asarray(em["frames_seen"])
    assert seen.all(), seen

    # eval-mode inference (the save_depth path) stays finite and positive
    d = np.asarray(engine.infer(
        state, np.asarray(data["frames"][:2])[:, None]))
    assert d.shape == (2, 1, 32, 64)
    assert np.isfinite(d).all() and (d > 0).all()


def test_midas2_nan_skip_guard():
    """A randomly-initialized MiDaS produces ReLU'd zero disparity ->
    inf depth -> NaN loss (the reference's unprotected reciprocal hits
    the same, depth_fine_tuning.py's host-side skip). The engine must
    mark the step skipped and keep params bit-identical."""
    from consistent_depth_tpu.models.midas_v2 import MidasV2Model

    model = MidasV2Model(checkpoint="")
    scene = synthetic.make_scene(num_frames=4, H=32, W=64)
    data = synthetic.build_pair_arrays(scene, synthetic.make_pairs(4))
    engine = TrainingEngine(
        model, create_optimizer("Adam", 1e-4),
        LossWeights(lambda_view_baseline=0.1, lambda_reprojection=1.0),
        precision="f32")
    state = engine.init_state()
    dev = engine.put_data(data)

    idx = np.arange(2, dtype=np.int32).reshape(1, 2)
    valid = np.ones((1, 2), np.float32)
    p0 = jax.device_get(state.params)
    state, metrics = engine.train_epoch(state, dev, idx, valid)
    assert np.asarray(metrics["skipped_nan"]).all()
    p1 = jax.device_get(state.params)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(a, b)
