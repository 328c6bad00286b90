"""Deduplicated eval pass (engine._eval_epoch_dedup_impl).

The production bf16 eval computes each unique frame's depth ONCE and
joins per-pair losses against the resulting buffer (the reference's
validation loop forwards every frame once per pair side —
depth_fine_tuning.py:312-341 — which at demo scale is ~6x redundant).
These tests pin:

1. the dedup program against a manual host-side composition of the
   engine's own forward + loss pieces (EXACT up to float noise — this
   validates chunking, dump-row padding, scale recovery, the scatter/
   gather, and BN-stat threading across chunks);
2. sharded-vs-unsharded parity of the dedup program on the virtual
   8-device CPU mesh (the production multi-chip path);
3. the paired eval's contract keys/shapes are preserved;
4. the precision-policy default (on under bf16, off under f32).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import synthetic
from consistent_depth_tpu.models.mannequin_challenge import (
    MannequinChallengeModel,
)
from consistent_depth_tpu.ops.losses import LossWeights, joint_loss
from consistent_depth_tpu.parallel import make_mesh
from consistent_depth_tpu.training import TrainingEngine, create_optimizer

pytestmark = pytest.mark.slow  # compile-heavy


N_FRAMES = 6


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(num_frames=N_FRAMES, H=32, W=48)


@pytest.fixture(scope="module")
def data(scene):
    return synthetic.build_pair_arrays(
        scene, synthetic.make_pairs(N_FRAMES))


def _pair_batches(P, B):
    S = (P + B - 1) // B
    flat = np.arange(S * B)
    idx = np.minimum(flat, P - 1).astype(np.int32).reshape(S, B)
    valid = (flat < P).astype(np.float32).reshape(S, B)
    return idx, valid


def _make_engine(mesh=None, eval_dedup=True):
    model = MannequinChallengeModel(checkpoint="", seed=0)
    return TrainingEngine(
        model, create_optimizer("Adam", 4e-4), LossWeights(),
        mesh=mesh, eval_dedup=eval_dedup)


def test_dedup_matches_manual_composition(data):
    """B=2 so the frame pass takes 2 chunks (4 frame-slots each over 6
    frames + 2 dump-row pads) — exercises BN-stat threading between
    chunks and the padding path."""
    engine = _make_engine()
    assert engine.eval_dedup
    state = engine.init_state()
    dev = engine.put_data(data)
    P = data["pair_ids"].shape[0]
    B = 2
    idx, valid = _pair_batches(P, B)

    state_out, m = engine.eval_epoch(state, dev, idx, valid)

    # ---- manual composition from the engine's own pieces ----
    frames = jnp.asarray(data["frames"])
    # chunking identical to engine.eval_epoch: per = 2B slots per chunk,
    # padding points at the dump row (= n_frames, which the frame gather
    # clamps to the last frame)
    per = 2 * B
    fsteps = -(-N_FRAMES // per)
    fslots = np.full((fsteps * per,), N_FRAMES, np.int32)
    fslots[:N_FRAMES] = np.arange(N_FRAMES)
    fslots = fslots.reshape(fsteps, B, 2)

    stats = state.batch_stats
    buf = np.zeros((N_FRAMES + 1, 32, 48), np.float32)
    for c in range(fsteps):
        slots = fslots[c]
        images = frames[jnp.minimum(jnp.asarray(slots), N_FRAMES - 1)]
        depth, stats = engine._forward(
            state.params, stats, images, None, train=True)
        buf[slots.reshape(-1)] = np.asarray(
            depth, np.float32).reshape(-1, 32, 48)

    reproj, disp, losses = [], [], []
    for s in range(idx.shape[0]):
        sl = data["pair_slots"][idx[s]]
        depth = jnp.asarray(buf[sl])
        loss, bl = joint_loss(
            depth,
            jnp.asarray(data["intrinsics"][idx[s]]),
            jnp.asarray(data["extrinsics"][idx[s]]),
            jnp.asarray(data["flows"][idx[s]]),
            jnp.asarray(data["masks"][idx[s]]),
            engine.weights, valid=jnp.asarray(valid[s]))
        losses.append(float(loss))
        reproj.append(np.asarray(bl["reprojection"]))
        disp.append(np.asarray(bl["disparity"]))

    np.testing.assert_allclose(
        np.asarray(jax.device_get(m["loss"])), losses, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(m["reprojection"])), reproj, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(m["disparity"])), disp, rtol=1e-5)
    # depth maps pass through ~60 BN layers; the one-program jit and the
    # chunk-by-chunk manual composition reassociate those reductions
    # differently (measured ~1e-4 relative) — structural errors in the
    # scatter/chunk/padding logic would be O(1), not 1e-4
    np.testing.assert_allclose(
        np.asarray(jax.device_get(m["depth_frames"])),
        buf[:N_FRAMES], rtol=5e-4)
    # every frame is referenced by some valid pair here
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(m["frames_seen"])), np.ones(N_FRAMES, bool))
    # BN running stats thread through the frame pass into the returned
    # state exactly like the manual chain
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(stats)),
                    jax.tree_util.tree_leaves(
                        jax.device_get(state_out.batch_stats))):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-6)


def test_dedup_scales_recovered_per_frame(data):
    """Per-pair (P, 2) scales are scattered back to per-frame values for
    the frame pass; depths must come out scaled per frame."""
    scales = 1.0 + 0.1 * np.arange(N_FRAMES, dtype=np.float32)
    d = dict(data)
    d["scales"] = scales[d["pair_slots"]].astype(np.float32)

    engine = _make_engine()
    state = engine.init_state()
    P = d["pair_ids"].shape[0]
    idx, valid = _pair_batches(P, 4)

    _, m_scaled = engine.eval_epoch(state, engine.put_data(d), idx, valid)
    _, m_plain = engine.eval_epoch(state, engine.put_data(data), idx, valid)
    df_s = np.asarray(jax.device_get(m_scaled["depth_frames"]))
    df_p = np.asarray(jax.device_get(m_plain["depth_frames"]))
    np.testing.assert_allclose(
        df_s, df_p * scales[:, None, None], rtol=1e-5)


def test_dedup_mesh_matches_single(data):
    """The sharded dedup program (pair batches P(None, 'data'), frame
    chunks P(None, 'data', None)) must match the unsharded one."""
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    P = data["pair_ids"].shape[0]
    idx, valid = _pair_batches(P, 8)

    def run(mesh):
        engine = _make_engine(mesh=mesh)
        state = engine.init_state()
        dev = engine.put_data(data)
        _, m = engine.eval_epoch(state, dev, idx, valid)
        return (np.asarray(jax.device_get(m["loss"])),
                np.asarray(jax.device_get(m["depth_frames"])),
                np.asarray(jax.device_get(m["frames_seen"])))

    l8, df8, seen8 = run(make_mesh())
    l1, df1, seen1 = run(None)
    # identical params, no training in front: only float reassociation
    # (sharded BN batch-stat psums) separates the two programs
    np.testing.assert_allclose(l8, l1, rtol=1e-4)
    np.testing.assert_allclose(df8, df1, rtol=2e-2, atol=1e-5)
    np.testing.assert_array_equal(seen8, seen1)


def test_dedup_keeps_paired_contract(data):
    """Same metric keys/shapes as the paired eval, and the losses agree
    at BN-batch-composition level (the two passes normalize each frame
    against different batch statistics — random-init nets make this the
    worst case; trained nets sit much closer).

    Band calibration (round 4): this tiny workload (6 frames, 32x48,
    random init) measures mean-loss rel 0.0216; the band below is ~2.3x
    that. At DEMO scale on the chip (tools/dedup_deviation.py, 244
    frames / 715 pairs, bf16) the same comparison measures mean-loss
    rel 7.7e-5 at random init and 1e-6 after 3 training epochs, with
    per-pair disparity-loss deltas p95 < 0.9% — the production
    deviation is far inside this gate."""
    P = data["pair_ids"].shape[0]
    idx, valid = _pair_batches(P, 4)

    def run(dedup):
        engine = _make_engine(eval_dedup=dedup)
        state = engine.init_state()
        _, m = engine.eval_epoch(state, engine.put_data(data), idx, valid)
        return {k: np.asarray(jax.device_get(v)) for k, v in m.items()}

    md, mp = run(True), run(False)
    assert set(md) == set(mp)
    for k in mp:
        assert md[k].shape == mp[k].shape, k
    np.testing.assert_array_equal(md["frames_seen"], mp["frames_seen"])
    assert np.isfinite(md["loss"]).all()
    np.testing.assert_allclose(
        md["loss"].mean(), mp["loss"].mean(), rtol=0.05)


def test_dedup_policy_default():
    model = MannequinChallengeModel(checkpoint="", seed=0)
    opt = create_optimizer("Adam", 4e-4)
    assert TrainingEngine(model, opt, LossWeights(),
                          precision="bf16").eval_dedup
    assert not TrainingEngine(model, opt, LossWeights(),
                              precision="f32").eval_dedup
    assert TrainingEngine(model, opt, LossWeights(), precision="f32",
                          eval_dedup=True).eval_dedup
