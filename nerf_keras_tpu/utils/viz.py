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
    rgb: np.ndarray | list[np.ndarray],
    depth: np.ndarray | list[np.ndarray],
    losses: list[float],
    epoch: int,
    total_epochs: int,
) -> None:
    """Write the pred/depth/loss 3-panel figure (train_lego.py:216-225).

    Accepts one view or a list of views — the reference renders the first
    2 val images per eval (train_lego.py:188); multiple views stack as
    rows sharing the loss plot.
    """
    rgbs = rgb if isinstance(rgb, list) else [rgb]
    depths = depth if isinstance(depth, list) else [depth]
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = len(rgbs)
    fig, ax = plt.subplots(nrows=rows, ncols=3, figsize=(20, 5 * rows),
                           squeeze=False)
    for r, (im, dp) in enumerate(zip(rgbs, depths)):
        ax[r][0].imshow(np.clip(im, 0.0, 1.0))
        ax[r][0].set_title(f"Predicted Image {r}: {epoch:03d}")
        ax[r][1].imshow(normalize_depth(dp), cmap="gray")
        ax[r][1].set_title(f"Depth Map {r}: {epoch:03d}")
        if r == 0:
            ax[r][2].plot(losses)
            ax[r][2].set_title(f"Loss Plot: {epoch:03d}")
        else:
            ax[r][2].axis("off")
    buf = _io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    with io.open_file(path, "wb") as f:
        f.write(buf.getvalue())


def save_png(path: str, img: np.ndarray) -> None:
    """Write a uint8 HxWx3 image as PNG through the fsspec IO layer
    (local or gs://)."""
    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(np.asarray(img)).save(buf, format="PNG")
    with io.open_file(path, "wb") as f:
        f.write(buf.getvalue())


def write_video(path: str, frames: list[np.ndarray], fps: int = 30) -> str:
    """Encode frames to mp4 (reference: imageio.mimwrite, inference.py:267).

    Falls back to an animated GIF next to ``path`` when no ffmpeg backend
    exists; returns the path actually written.
    """
    if not frames:
        # Fail here with a clear message: an empty list previously fell
        # into the GIF branch and died on imgs[0] with an IndexError that
        # masked the real problem.
        raise ValueError(f"write_video({path!r}): no frames to encode")
    frames = [to_uint8(f) if f.dtype != np.uint8 else f for f in frames]
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, frames, fps=fps, quality=7, macro_block_size=None)
        return path
    except (ImportError, OSError, ValueError) as e:
        # Missing ffmpeg backend (this image) or an unencodable container
        # -> GIF fallback; anything else should surface, not degrade.
        print(f"[nerf-tpu] mp4 encode unavailable ({e}); writing GIF")
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
