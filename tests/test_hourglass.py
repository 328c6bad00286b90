"""Hourglass forward/weight-import parity against the torch twin."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistent_depth_tpu.models import torch_import
from consistent_depth_tpu.models.hourglass import HourglassModel

pytestmark = pytest.mark.slow  # compile-heavy


@pytest.fixture(scope="module")
def twin_and_flax():
    import torch
    from torch_twins import HourglassModelTwin

    torch.manual_seed(0)
    twin = HourglassModelTwin()
    twin.eval()

    model = HourglassModel()
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False)
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = torch_import.state_dict_to_variables(sd, template)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    return twin, model, variables


def test_import_covers_all_keys(twin_and_flax):
    twin, model, variables = twin_and_flax
    n_torch = sum(
        1 for k in twin.state_dict() if not k.endswith("num_batches_tracked"))
    n_flax = len(jax.tree_util.tree_leaves(variables))
    assert n_torch == n_flax


def test_forward_parity_eval(twin_and_flax):
    import torch

    twin, model, variables = twin_and_flax
    rng = np.random.default_rng(0)
    x = rng.random((2, 32, 48, 3)).astype(np.float32)

    with torch.no_grad():
        t_pred, t_conf = twin(torch.tensor(x.transpose(0, 3, 1, 2)))

    j_pred, j_conf = model.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(
        np.asarray(j_pred)[..., 0], t_pred.numpy()[:, 0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(j_conf)[..., 0], t_conf.numpy()[:, 0], rtol=1e-4, atol=1e-4)


def test_forward_parity_train_mode(twin_and_flax):
    """Training-mode BN (batch stats) parity + running-stat updates."""
    import torch

    import copy

    twin, model, variables = twin_and_flax
    sd_backup = copy.deepcopy(twin.state_dict())
    twin_t = twin.train()
    rng = np.random.default_rng(1)
    x = rng.random((2, 16, 16, 3)).astype(np.float32)

    with torch.no_grad():
        t_pred, _ = twin_t(torch.tensor(x.transpose(0, 3, 1, 2)))

    j_pred, mutated = model.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    # train-mode BN normalizes by *batch* std at every one of ~60
    # layers; with random weights this conditions tiny fp differences
    # badly, so compare in norm rather than elementwise
    a = np.asarray(j_pred[0])[..., 0]
    b = t_pred.numpy()[:, 0]
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel < 2e-2, rel

    # running stats updated identically (torch updates them in train mode)
    t_sd = twin_t.state_dict()
    ours = dict(torch_import._iter_leaves(mutated["batch_stats"]))
    t_stem_mean = t_sd["seq.1.running_mean"].numpy()
    j_stem_mean = np.asarray(ours[("seq_1", "mean")])
    np.testing.assert_allclose(j_stem_mean, t_stem_mean, rtol=1e-4, atol=1e-5)
    # restore: the in-place running-stat updates must not leak into
    # other tests sharing the module-scoped twin
    twin.load_state_dict(sd_backup)
    twin.eval()


def test_export_roundtrip(twin_and_flax, tmp_path):
    import torch

    twin, model, variables = twin_and_flax
    fn = str(tmp_path / "ckpt.pth")
    torch_import.save_torch_checkpoint(fn, jax.device_get(variables))
    sd = torch.load(fn)
    ref_sd = twin.state_dict()
    keys = {k for k in ref_sd if not k.endswith("num_batches_tracked")}
    assert set(sd.keys()) == keys
    for k in keys:
        np.testing.assert_allclose(
            sd[k].numpy(), ref_sd[k].numpy(), rtol=1e-6, atol=1e-7)


def test_scanned_runs_match_unrolled():
    """The scanned repeated-block path (hourglass.SCAN_REPEATED_BLOCKS;
    consecutive identical inception configs execute as one lax.scan
    over stacked params) must produce the same parameter tree, the same
    init values, and fp-noise-identical outputs and BN running stats as
    the unrolled path — it is a TPU codegen-size optimization, not a
    semantic change (see PERF.md round-4 compile section)."""
    from consistent_depth_tpu.models import hourglass

    x = jnp.asarray(
        np.random.default_rng(0).random((2, 32, 32, 3), np.float32))
    model = HourglassModel()

    def run(scan):
        hourglass.set_scan_repeated_blocks(scan)
        try:
            v = model.init(jax.random.PRNGKey(0), x, train=False)
            (pred, conf), mut = model.apply(
                v, x, train=True, mutable=["batch_stats"])
            return v, pred, conf, mut
        finally:
            hourglass.set_scan_repeated_blocks(True)

    v_s, pred_s, conf_s, mut_s = run(True)
    v_u, pred_u, conf_u, mut_u = run(False)

    assert (jax.tree_util.tree_structure(v_s)
            == jax.tree_util.tree_structure(v_u))
    for a, b in zip(jax.tree_util.tree_leaves(v_s),
                    jax.tree_util.tree_leaves(v_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(pred_s), np.asarray(pred_u), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(conf_s), np.asarray(conf_u), atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(mut_s),
                    jax.tree_util.tree_leaves(mut_u)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5)
