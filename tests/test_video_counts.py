"""extract_frames artifact counting (reference video.py:126-152).

The round-3 VERDICT flagged that a stray file in color_full/ failed the
post-extraction count with a misleading message; only frame_%06d.png
files may count.
"""

import os
from os.path import join as pjoin

from consistent_depth_tpu.pipeline import video as video_mod
from consistent_depth_tpu.pipeline.video import Video


def _fake_video(tmp_path, n=3):
    path = str(tmp_path)
    with open(pjoin(path, "frames.txt"), "w") as f:
        f.write(f"{n}\n64\n48\n" + "".join(f"{i / 30:.6f}\n"
                                           for i in range(n)))
    vid_file = pjoin(path, "vid.mp4")
    open(vid_file, "wb").write(b"\x00")
    v = Video(path, vid_file)
    assert v.check_extracted_pts()
    return v


def test_stray_file_does_not_break_frame_count(tmp_path, monkeypatch):
    v = _fake_video(tmp_path, n=3)
    frame_dir = pjoin(v.path, "color_full")

    def fake_run(cmd, **kwargs):
        for i in range(3):
            open(pjoin(frame_dir, f"frame_{i:06d}.png"), "wb").write(
                b"\x89PNG")
        # droppings that must not count: hidden files, non-frame pngs
        open(pjoin(frame_dir, ".DS_Store"), "w").close()
        open(pjoin(frame_dir, "preview.png"), "w").close()

        class R:
            returncode = 0
        return R()

    monkeypatch.setattr(video_mod, "require_binary", lambda name: name)
    monkeypatch.setattr(video_mod.subprocess, "run", fake_run)
    v.extract_frames()  # must not sys.exit on the stray files
    # but check_frames itself still sees exactly the expected set
    assert sorted(
        n for n in os.listdir(frame_dir)
        if n.startswith("frame_")) == [
        f"frame_{i:06d}.png" for i in range(3)]
