"""Image resize/encode helpers (no TensorFlow).

The reference uses ``tf.image.resize`` (lego_data_utils.py:23) and
ImageMagick ``mogrify`` subprocesses (fern_data_utils.py:45-51); here both
are in-process: jax.image for float arrays, PIL for file IO.
"""

from __future__ import annotations

import numpy as np


def resize_bilinear(images: np.ndarray, height: int, width: int) -> np.ndarray:
    """Bilinear resize of (N, H, W, C) or (H, W, C) float arrays.

    Matches tf.image.resize's default (bilinear, antialias=False,
    half-pixel centers) closely enough for training parity.
    """
    import jax
    import jax.numpy as jnp

    arr = jnp.asarray(images, dtype=jnp.float32)
    squeeze = arr.ndim == 3
    if squeeze:
        arr = arr[None]
    if arr.shape[1:3] == (height, width):
        out = arr
    else:
        out = jax.image.resize(
            arr, (arr.shape[0], height, width, arr.shape[3]), method="bilinear"
        )
    out = np.asarray(out, dtype=np.float32)
    return out[0] if squeeze else out


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[0,1] float -> uint8 with the reference's clip*255 (inference.py:260).

    Idempotent: already-uint8 input (the device-side conversion path,
    ``Trainer.render_rays(uint8_rgb=True)``) passes through unchanged —
    re-scaling it by 255 would white-out the frame."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    return np.clip(255.0 * img, 0.0, 255.0).astype(np.uint8)


def normalize_depth(depth: np.ndarray) -> np.ndarray:
    """Scale a depth map to [0,1] for display."""
    d = np.asarray(depth, dtype=np.float32)
    lo, hi = float(d.min()), float(d.max())
    if hi - lo < 1e-8:
        return np.zeros_like(d)
    return (d - lo) / (hi - lo)
