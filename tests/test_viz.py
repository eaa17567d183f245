"""Visualization utilities: panel rendering, video/GIF fallback encoding."""

import numpy as np

from nerf_keras_tpu.utils.viz import frames_to_video, save_panel, write_video


def _frames(n=4, h=16, w=16):
    rng = np.random.default_rng(0)
    return [rng.uniform(0, 1, (h, w, 3)).astype(np.float32) for _ in range(n)]


def test_save_panel(tmp_path):
    path = str(tmp_path / "panel.png")
    rgb = np.zeros((16, 16, 3), np.float32)
    depth = np.linspace(2, 6, 256).reshape(16, 16).astype(np.float32)
    save_panel(path, rgb, depth, [0.5, 0.3, 0.2], epoch=2, total_epochs=10)
    with open(path, "rb") as f:
        assert f.read(8)[:4] == b"\x89PNG"


def test_write_video_fallback(tmp_path):
    """Writes mp4 when an ffmpeg backend exists, else an animated GIF —
    either way the returned path exists and is non-empty."""
    out = write_video(str(tmp_path / "vid.mp4"), _frames())
    import os

    assert os.path.exists(out)
    assert os.path.getsize(out) > 0
    assert out.endswith((".mp4", ".gif"))


def test_frames_to_video(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i, f in enumerate(_frames()):
        Image.fromarray((f * 255).astype(np.uint8)).save(img_dir / f"{i:03d}.png")
    out = frames_to_video(str(img_dir), str(tmp_path / "progress.mp4"))
    import os

    assert os.path.getsize(out) > 0
