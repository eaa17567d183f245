"""Blender-synthetic "tiny Lego" dataset loader.

Capability parity with reference lego_data_utils.py:8-51
(``prepare_lego_data``): loads ``tiny_nerf_data.npz`` (images, poses,
focal), resizes to the config resolution, splits 80/20 by index, converts
poses to per-pixel rays and flattens to rows, with fixed bounds near=2,
far=6.

Differences by construction:

* no implicit network download at call time — the file is resolved from
  ``NERF_DATA_DIR``, ``./data`` or the keras cache dir; if absent we
  attempt one download (reference URL) and raise a clear error offline;
* the reference's val-ray bug (``get_rays(H, H, ...)`` at
  lego_data_utils.py:34, which breaks for non-square images) is fixed —
  val rays use (H, W) like train rays.
"""

from __future__ import annotations

import os
import urllib.request

import numpy as np

from nerf_keras_tpu.data.pipeline import (
    RayDataset,
    build_ray_dataset,
    rescale_focal,
)
from nerf_keras_tpu.utils.image import resize_bilinear

LEGO_URL = (
    "http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/ECCV20/nerf/"
    "tiny_nerf_data.npz"
)
_FILENAME = "tiny_nerf_data.npz"


def find_lego_npz(path: str | None = None) -> str:
    """Locate (or fetch) tiny_nerf_data.npz."""
    candidates = [path] if path else []
    if os.environ.get("NERF_DATA_DIR"):
        candidates.append(os.path.join(os.environ["NERF_DATA_DIR"], _FILENAME))
    candidates += [
        os.path.join("data", _FILENAME),
        os.path.expanduser(f"~/.keras/datasets/{_FILENAME}"),
        os.path.expanduser(f"~/.cache/nerf_keras_tpu/{_FILENAME}"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    target = os.path.expanduser(f"~/.cache/nerf_keras_tpu/{_FILENAME}")
    os.makedirs(os.path.dirname(target), exist_ok=True)
    # Download to a temp name + atomic rename: an interrupted download at
    # the final path would be returned as a valid cache hit forever after.
    tmp = f"{target}.{os.getpid()}.tmp"
    try:
        urllib.request.urlretrieve(LEGO_URL, tmp)
        os.replace(tmp, target)
        return target
    except Exception as e:  # zero-egress environments
        raise FileNotFoundError(
            f"tiny_nerf_data.npz not found in {candidates} and download "
            f"failed ({e}). Place the file under $NERF_DATA_DIR or ./data."
        ) from e
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def split_data(
    images: np.ndarray, poses: np.ndarray, split_ratio: float = 0.8
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """First (ratio) / last (1-ratio) split by index (data_utils.py:100-117)."""
    split = int(images.shape[0] * split_ratio)
    return images[:split], images[split:], poses[:split], poses[split:]


def prepare_lego_data(
    target_height: int,
    target_width: int,
    path: str | None = None,
) -> tuple[RayDataset, RayDataset, tuple[float, float], float]:
    """Load + preprocess Lego into train/val RayDatasets.

    Returns ``(train, val, (near, far), focal)``.
    """
    data = np.load(find_lego_npz(path))
    images = data["images"].astype(np.float32)
    poses = data["poses"].astype(np.float32)
    src_h, src_w = images.shape[1:3]
    # Focal scales with the resize (pipeline.rescale_focal docstring);
    # the reference keeps the native 100x100 focal for its 25x25/50x50
    # configs, which makes every resized config's rays span the wrong FOV.
    focal = rescale_focal(
        float(data["focal"]), src_h, src_w, target_height, target_width
    )

    images = resize_bilinear(images, target_height, target_width)

    train_imgs, val_imgs, train_poses, val_poses = split_data(images, poses)

    near, far = 2.0, 6.0

    def build(imgs: np.ndarray, pose_set: np.ndarray) -> RayDataset:
        return build_ray_dataset(
            imgs, pose_set, target_height, target_width, focal, near, far
        )

    return (
        build(train_imgs, train_poses),
        build(val_imgs, val_poses),
        (near, far),
        focal,
    )
