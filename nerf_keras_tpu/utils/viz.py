"""Visualization: per-epoch panels and novel-view videos.

Counterparts of the reference's matplotlib 3-panel PNG
(train_lego.py:216-225: predicted rgb / depth / loss curve) and its
mp4 writers (inference.py:267-268, visualization.py:22-37) — with a GIF
fallback when no ffmpeg backend is available in the environment.
"""

from __future__ import annotations

import io as _io

import numpy as np

from nerf_keras_tpu.utils import io
from nerf_keras_tpu.utils.image import normalize_depth, to_uint8


def save_panel(
    path: str,
    rgb: np.ndarray,
    depth: np.ndarray,
    losses: list[float],
    epoch: int,
    total_epochs: int,
) -> None:
    """Write the pred/depth/loss 3-panel figure (train_lego.py:216-225)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(nrows=1, ncols=3, figsize=(20, 5))
    ax[0].imshow(np.clip(rgb, 0.0, 1.0))
    ax[0].set_title(f"Predicted Image: {epoch:03d}")
    ax[1].imshow(normalize_depth(depth), cmap="gray")
    ax[1].set_title(f"Depth Map: {epoch:03d}")
    ax[2].plot(losses)
    ax[2].set_title(f"Loss Plot: {epoch:03d}")
    buf = _io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    with io.open_file(path, "wb") as f:
        f.write(buf.getvalue())


def write_video(path: str, frames: list[np.ndarray], fps: int = 30) -> str:
    """Encode frames to mp4 (reference: imageio.mimwrite, inference.py:267).

    Falls back to an animated GIF next to ``path`` when no ffmpeg backend
    exists; returns the path actually written.
    """
    frames = [to_uint8(f) if f.dtype != np.uint8 else f for f in frames]
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, frames, fps=fps, quality=7, macro_block_size=None)
        return path
    except Exception:
        gif_path = path.rsplit(".", 1)[0] + ".gif"
        from PIL import Image

        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(
            gif_path,
            save_all=True,
            append_images=imgs[1:],
            duration=max(1, int(1000 / fps)),
            loop=0,
        )
        return gif_path


def frames_to_video(image_dir: str, out_path: str, fps: int = 30) -> str:
    """Glob per-epoch PNGs and encode a training-progress video
    (reference visualization.py:22-37)."""
    import imageio.v2 as imageio

    names = [n for n in io.listdir(image_dir) if n.endswith(".png")]
    frames = []
    for name in sorted(names):
        with io.open_file(io.join(image_dir, name), "rb") as f:
            frames.append(imageio.imread(f.read()))
    if not frames:
        raise FileNotFoundError(f"no PNG frames found under {image_dir}")
    return write_video(out_path, frames, fps=fps)
