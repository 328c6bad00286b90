"""Model cache: cache hit, offline failure message, URL registry."""

import os

import pytest

from consistent_depth_tpu.utils import url_helpers


def test_cache_hit(tmp_path):
    local = tmp_path / "m.pth"
    local.write_bytes(b"x")
    out = url_helpers.get_model_from_url(
        "http://127.0.0.1:1/none", "m.pth", path_root=str(tmp_path))
    assert out == str(local)


def test_offline_raises_with_guidance(tmp_path):
    with pytest.raises(RuntimeError, match="offline|download|place"):
        url_helpers.get_model_from_url(
            "http://127.0.0.1:1/none", "missing.pth",
            path_root=str(tmp_path))


def test_registry_names():
    assert set(url_helpers.MODEL_URLS) >= {
        "mc", "midas2", "monodepth2", "flownet2", "flownet2-kitti"}
