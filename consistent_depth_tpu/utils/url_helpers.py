"""Pretrained-model download cache (reference: utils/url_helpers.py).

Checkpoints are cached under ``checkpoints/``. In offline environments
the download is skipped with a clear message; callers fall back to
random initialization or a user-provided path.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import urllib.error
import urllib.request
import zipfile
from typing import Optional

# socket timeout for checkpoint downloads — without one, a network that
# blackholes packets (rather than refusing) would hang model
# construction indefinitely
FETCH_TIMEOUT_S = float(os.environ.get("CDTPU_FETCH_TIMEOUT", "60"))


def get_model_from_url(
    url: str, local_path: str, is_zip: bool = False,
    path_root: Optional[str] = None,
) -> str:
    if path_root is None:
        path_root = os.environ.get("CDTPU_CHECKPOINT_DIR", "checkpoints")
    local_path = os.path.join(path_root, local_path)
    if os.path.exists(local_path):
        print(f"Found cache {local_path}")
        return local_path

    # download
    local_path = local_path.rstrip("/")
    download_path = local_path if not is_zip else f"{local_path}.zip"
    os.makedirs(os.path.dirname(download_path), exist_ok=True)
    try:
        print(f"Dowloading {url} to {download_path} ...")
        try:
            with urllib.request.urlopen(url, timeout=FETCH_TIMEOUT_S) as r, \
                    open(download_path, "wb") as f:
                shutil.copyfileobj(r, f)
        except BaseException:
            # never leave a partial download behind — it would be
            # mistaken for a cache hit on the next construction
            if os.path.exists(download_path):
                os.remove(download_path)
            raise
    except (urllib.error.URLError, OSError) as e:
        raise RuntimeError(
            f"Could not download '{url}' ({e}). This environment may be "
            f"offline — place the checkpoint at '{local_path}' manually."
        ) from e

    if is_zip:
        print(f"Unziping {download_path} to {local_path}")
        # extract to a sibling temp dir and rename into place so an
        # interrupted extractall can't leave a partial directory that the
        # os.path.exists cache check above would treat as complete
        tmp_dir = tempfile.mkdtemp(
            prefix=os.path.basename(local_path) + ".partial.",
            dir=os.path.dirname(download_path) or ".")
        try:
            with zipfile.ZipFile(download_path, "r") as f:
                f.extractall(tmp_dir)
            os.rename(tmp_dir, local_path)
        except BaseException:
            shutil.rmtree(tmp_dir, ignore_errors=True)
            raise
        os.remove(download_path)
    return local_path


# canonical checkpoint URLs (reference adapters)
MODEL_URLS = {
    "mc": (
        "https://storage.googleapis.com/mannequinchallenge-data/checkpoints/"
        "best_depth_Ours_Bilinear_inc_3_net_G.pth",
        "mc.pth", False),
    "midas2": (
        "https://github.com/intel-isl/MiDaS/releases/download/v2/"
        "model-f46da743.pt",
        "midas2.pth", False),
    "monodepth2": (
        "https://storage.googleapis.com/niantic-lon-static/research/"
        "monodepth2/mono+stereo_1024x320.zip",
        "monodepth2_mono+stereo_1024x320/", True),
    "flownet2": (
        "https://www.dropbox.com/s/sziorbzbsk32mbv/flownet2.pth?dl=1",
        "flownet2.pth", False),
    "flownet2-kitti": (
        "https://www.dropbox.com/s/mme80czrpbqal7k/flownet2-kitti.pth.tar?dl=1",
        "flownet2-kitti.pth", False),
}


def fetch_model(name: str) -> str:
    url, local, is_zip = MODEL_URLS[name]
    return get_model_from_url(url, local, is_zip=is_zip)
