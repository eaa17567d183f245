"""Full Blender ``nerf_synthetic`` scene loader (transforms_*.json + PNGs).

Capability the reference does NOT have: its only synthetic loader consumes
the 100x100 pre-baked ``tiny_nerf_data.npz`` subset (lego_data_utils.py:8-51).
The published nerf_synthetic scenes (lego, chair, drums, ficus, hotdog,
materials, mic, ship) ship as the original Blender export instead:

    scene/
      transforms_train.json   {"camera_angle_x": a, "frames": [
      transforms_val.json        {"file_path": "./train/r_0",
      transforms_test.json        "transform_matrix": 4x4 c2w}, ...]}
      train/r_*.png           800x800 RGBA
      val/r_*.png  test/r_*.png

This loader reads that format directly, so real-dataset training needs no
conversion step.  Design points:

* the 4x4 ``transform_matrix`` is the same OpenGL-style camera-to-world
  convention as ``ops.rays.get_rays`` (x right, y up, z backward) — poses
  pass through unchanged;
* focal derives from ``camera_angle_x``: ``f = W/2 / tan(a/2)`` at the
  native width, then rescales with the resize (pipeline.rescale_focal);
* PNGs are RGBA — alpha is composited here onto a white or black
  background (``white_bkgd``), matching what the renderer will composite
  (NeRFConfig.white_bkgd), the standard NeRF treatment;
* bounds are the published near=2, far=6 used for every nerf_synthetic
  scene (reference lego_data_utils.py:47 uses the same pair).

API contract matches ``prepare_lego_data`` (same return tuple).
"""

from __future__ import annotations

import json
import os

import numpy as np

from nerf_keras_tpu.data.pipeline import (
    RayDataset,
    build_ray_dataset,
    rescale_focal,
)

NEAR, FAR = 2.0, 6.0


def find_blender_scene(path: str | None = None, scene: str = "lego") -> str:
    """Locate a nerf_synthetic scene directory (no download — zero egress).

    Resolution order: explicit ``path`` (the scene itself, or a dataset
    root containing ``{scene}`` / ``nerf_synthetic/{scene}``),
    ``$NERF_DATA_DIR/nerf_synthetic/{scene}``, ``$NERF_DATA_DIR/{scene}``,
    ``./data/nerf_synthetic/{scene}``.  A directory qualifies if it holds
    ``transforms_train.json``.
    """
    candidates = []
    if path:
        candidates += [
            path,
            os.path.join(path, scene),
            os.path.join(path, "nerf_synthetic", scene),
        ]
    root = os.environ.get("NERF_DATA_DIR")
    if root:
        candidates += [
            os.path.join(root, "nerf_synthetic", scene),
            os.path.join(root, scene),
        ]
    candidates += [
        os.path.join("data", "nerf_synthetic", scene),
        os.path.join("data", scene),
    ]
    for c in candidates:
        if c and os.path.isfile(os.path.join(c, "transforms_train.json")):
            return c
    raise FileNotFoundError(
        f"No Blender scene (transforms_train.json) found in {candidates}. "
        f"Point --data-dir or $NERF_DATA_DIR at a nerf_synthetic scene."
    )


def _read_rgba(path: str) -> np.ndarray:
    """Decode a PNG to float32 [0,1], keeping alpha when present."""
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("RGBA")
        return np.asarray(img, dtype=np.float32) / 255.0


def _composite(rgba: np.ndarray, white_bkgd: bool) -> np.ndarray:
    """Alpha-composite (H, W, 4) onto a solid background -> (H, W, 3)."""
    rgb, a = rgba[..., :3], rgba[..., 3:4]
    bkgd = 1.0 if white_bkgd else 0.0
    return rgb * a + bkgd * (1.0 - a)


def load_blender_split(
    scene_dir: str, split: str, *, white_bkgd: bool = True, every: int = 1
) -> tuple[np.ndarray, np.ndarray, float]:
    """Load one transforms_{split}.json: (images, poses, camera_angle_x).

    ``every`` keeps every k-th frame (the standard --testskip knob for the
    200-frame test split).  Images are native resolution, background
    pre-composited; poses are (V, 4, 4) float32 camera-to-world.
    """
    meta_path = os.path.join(scene_dir, f"transforms_{split}.json")
    with open(meta_path) as f:
        meta = json.load(f)
    frames = meta["frames"][:: max(1, every)]
    images, poses = [], []
    for fr in frames:
        rel = fr["file_path"]
        img_path = os.path.join(scene_dir, rel)
        if not os.path.splitext(img_path)[1]:
            img_path += ".png"
        images.append(_composite(_read_rgba(img_path), white_bkgd))
        poses.append(np.asarray(fr["transform_matrix"], dtype=np.float32))
    return (
        np.stack(images).astype(np.float32),
        np.stack(poses),
        float(meta["camera_angle_x"]),
    )


def prepare_blender_data(
    target_height: int,
    target_width: int,
    path: str | None = None,
    *,
    scene: str = "lego",
    white_bkgd: bool = True,
    val_split: str = "val",
    val_every: int = 8,
) -> tuple[RayDataset, RayDataset, tuple[float, float], float]:
    """Load a full nerf_synthetic scene into train/val RayDatasets.

    ``val_every`` subsamples the (large) val/test split so the per-epoch
    eval pass stays cheap; ``val_split='test'`` scores against the split
    published results use.  Returns ``(train, val, (near, far), focal)``.
    """
    from nerf_keras_tpu.utils.image import resize_bilinear

    scene_dir = find_blender_scene(path, scene)
    train_imgs, train_poses, angle_x = load_blender_split(
        scene_dir, "train", white_bkgd=white_bkgd
    )
    if os.path.isfile(os.path.join(scene_dir, f"transforms_{val_split}.json")):
        # A PRESENT split must load cleanly: a missing PNG inside it is
        # corrupt data and should fail loudly, not silently fall back.
        val_imgs, val_poses, _ = load_blender_split(
            scene_dir, val_split, white_bkgd=white_bkgd, every=val_every
        )
    else:
        # Scene shipped without a val split: hold out the train tail,
        # the tiny-npz loader's 80/20 convention.
        cut = int(train_imgs.shape[0] * 0.8)
        train_imgs, val_imgs = train_imgs[:cut], train_imgs[cut:]
        train_poses, val_poses = train_poses[:cut], train_poses[cut:]

    src_h, src_w = train_imgs.shape[1:3]
    native_focal = 0.5 * src_w / np.tan(0.5 * angle_x)
    focal = rescale_focal(
        float(native_focal), src_h, src_w, target_height, target_width
    )
    train_imgs = resize_bilinear(train_imgs, target_height, target_width)
    val_imgs = resize_bilinear(val_imgs, target_height, target_width)

    def build(imgs: np.ndarray, pose_set: np.ndarray) -> RayDataset:
        return build_ray_dataset(
            imgs, pose_set, target_height, target_width, focal, NEAR, FAR
        )

    return (
        build(train_imgs, train_poses),
        build(val_imgs, val_poses),
        (NEAR, FAR),
        focal,
    )
