"""Real published-checkpoint import gate (round-3 VERDICT missing #1).

These tests run IF AND ONLY IF the published pretrained weights are
present under ``checkpoints/`` (populated by
``python tools/fetch_checkpoints.py`` in an online environment, or by
manually dropping the files — see CHECKPOINT_ATTEMPT.log for the URLs
and paths). Offline they skip with a pointer; the repo's twin-parity
tests (tests/test_hourglass.py etc.) remain the offline evidence.

What running them proves: the torch->flax importer consumes the REAL
reference checkpoints strict=True (reference pins:
mannequin_challenge_model.py:29-41, midas_v2_model.py:32-39,
monodepth2_model.py:26-50), the loaded model produces finite depth at
the production resolution, and a save round-trips bit-identically.
"""

import os

import numpy as np
import pytest

CKPT_DIR = os.environ.get("CDTPU_CHECKPOINT_DIR", "checkpoints")

CASES = {
    "mc": ("mc.pth", "MannequinChallengeModel",
           "consistent_depth_tpu.models.mannequin_challenge"),
    "midas2": ("midas2.pth", "MidasV2Model",
               "consistent_depth_tpu.models.midas_v2"),
    "monodepth2": ("monodepth2_mono+stereo_1024x320", "Monodepth2Model",
                   "consistent_depth_tpu.models.monodepth2"),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(CASES))
def test_real_checkpoint_imports_strict(name):
    rel, cls_name, module_name = CASES[name]
    path = os.path.join(CKPT_DIR, rel)
    if not os.path.exists(path):
        pytest.skip(
            f"published {name} checkpoint not present at {path} — run "
            "tools/fetch_checkpoints.py online or drop it manually "
            "(see CHECKPOINT_ATTEMPT.log)")

    import importlib

    import jax.numpy as jnp

    from consistent_depth_tpu.models import torch_import

    cls = getattr(importlib.import_module(module_name), cls_name)
    model = cls(checkpoint=path)  # _load_checkpoint is strict=True

    # the import must actually have replaced the random init: export
    # back to a torch state_dict and compare against the file
    sd_file = {}
    if os.path.isdir(path):  # monodepth2 zip layout
        for part in ("encoder.pth", "depth.pth"):
            sd_file.update(torch_import.load_torch_checkpoint(
                os.path.join(path, part)))
        for k in ("height", "width", "use_stereo"):
            sd_file.pop(k, None)
    else:
        sd_file = torch_import.load_torch_checkpoint(path)
    sd_file = {k: v for k, v in sd_file.items()
               if isinstance(v, np.ndarray)}
    sd_ours = torch_import.variables_to_state_dict(
        {k: v for k, v in model.variables.items()})
    for key, ref in sd_file.items():
        got = sd_ours[key]
        assert got.shape == ref.shape, key
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=0, atol=0, err_msg=key)

    # and the loaded net produces finite positive depth at demo size
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 1, 224, 384, 3), np.float32))
    depth, _ = model.apply(model.variables, x, train=False)
    d = np.asarray(depth)
    assert np.isfinite(d).all() and (d > 0).all()
