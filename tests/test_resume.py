"""Fine-tuning --resume: interrupted training continues from the last
full-state checkpoint instead of restarting at epoch 0 (an improvement
over the reference, which always restarts — SURVEY §5)."""

import argparse
import os
import shutil
from os.path import join as pjoin

import pytest

import synthetic

pytestmark = pytest.mark.slow  # compile-heavy


def _params(path, epochs):
    return argparse.Namespace(
        path=path, model_type="mc", batch_size=2, num_epochs=epochs,
        learning_rate=4e-4, optimizer="Adam",
        lambda_view_baseline=0.1, lambda_reprojection=1.0,
        lambda_parameter=0, val_epoch_freq=10, save_epoch_freq=1,
        print_freq=1000, display_freq=4, log_dir=None,
        use_mesh=False, model_checkpoint="", resume=True, profile_dir=None)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("resume"))
    scene = synthetic.make_scene(num_frames=4, H=16, W=32)
    pairs = synthetic.make_pairs(4)
    synthetic.write_dataset_dir(path, scene, pairs)
    range_dir = pjoin(path, "R_hierarchical2_mc")
    os.makedirs(range_dir, exist_ok=True)
    shutil.copy(pjoin(path, "metadata.npz"),
                pjoin(range_dir, "metadata_scaled.npz"))
    return path, range_dir


def test_resume_continues_from_checkpoint(tiny_dataset, capsys):
    from consistent_depth_tpu.training.fine_tuning import DepthFineTuner

    path, range_dir = tiny_dataset

    # run 1: a single epoch, writing full_0001
    ft = DepthFineTuner(range_dir, list(range(4)), _params(path, 1))
    ft.fine_tune()
    ckpt_dir = ft.checkpoints_dir
    assert os.path.isdir(pjoin(ckpt_dir, "full_0001"))

    # run 2: ask for 2 epochs with --resume -> starts at epoch 1
    ft2 = DepthFineTuner(range_dir, list(range(4)), _params(path, 2))
    ft2.fine_tune()
    out = capsys.readouterr().out
    assert "Resumed from" in out and "(epoch 1)" in out
    assert "Epoch = 0," not in out.split("Resumed from")[1]
    assert os.path.isdir(pjoin(ckpt_dir, "full_0002"))
    assert int(ft2.state.step) > 0
