"""Procedural synthetic dataset (no network, no files).

Not present in the reference — added so tests, benchmarks and CI can run a
full end-to-end train/render cycle in a zero-egress environment (the
reference's Lego loader downloads from a UCSD URL at import time,
lego_data_utils.py:11-14).  The scene is a diffuse colored sphere at the
origin rendered analytically with exact ray-sphere intersection; a NeRF
trained on it must drive PSNR up quickly, which the e2e tests assert.

API contract matches ``prepare_lego_data`` (same return tuple).
"""

from __future__ import annotations

import numpy as np

from nerf_keras_tpu.data.pipeline import RayDataset, flatten_views
from nerf_keras_tpu.ops.rays import get_rays, pose_spherical


def _render_analytic(
    origins: np.ndarray, dirs: np.ndarray, radius: float = 1.0
) -> np.ndarray:
    """Exact render of a unit-ish sphere: lambertian-shaded orange on white."""
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    b = np.sum(o * d, axis=-1)
    c = np.sum(o * o, axis=-1) - radius**2
    disc = b * b - np.sum(d * d, axis=-1) * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / np.sum(d * d, axis=-1), 0.0)
    hit &= t > 0
    point = o + d * t[:, None]
    normal = point / np.maximum(np.linalg.norm(point, axis=-1, keepdims=True), 1e-8)
    light = np.asarray([0.57735, 0.57735, 0.57735])
    shade = np.clip(normal @ light, 0.0, 1.0)[:, None]
    base = np.asarray([0.9, 0.45, 0.1])
    rgb = np.where(
        hit[:, None], 0.25 * base + 0.75 * base * shade, np.ones(3)
    )
    return rgb.reshape(*origins.shape[:-1], 3).astype(np.float32)


def prepare_synthetic_data(
    target_height: int,
    target_width: int,
    num_views: int = 12,
    seed: int = 0,
    split_ratio: float = 0.8,
) -> tuple[RayDataset, RayDataset, tuple[float, float], float]:
    """Build train/val RayDatasets of a procedural sphere scene.

    Returns ``(train, val, (near, far), focal)`` — same contract as
    :func:`nerf_keras_tpu.data.lego.prepare_lego_data`.
    """
    rng = np.random.default_rng(seed)
    focal = 1.2 * max(target_height, target_width)
    near, far = 2.0, 6.0

    thetas = np.linspace(0.0, 360.0, num_views, endpoint=False)
    phis = rng.uniform(-40.0, -20.0, size=num_views)

    images, all_oris, all_dirs = [], [], []
    for theta, phi in zip(thetas, phis):
        pose = pose_spherical(float(theta), float(phi), 4.0)
        oris, dirs = get_rays(target_height, target_width, focal, pose)
        oris, dirs = np.asarray(oris), np.asarray(dirs)
        images.append(_render_analytic(oris, dirs))
        all_oris.append(oris)
        all_dirs.append(dirs)

    images = np.stack(images)
    all_oris = np.stack(all_oris)
    all_dirs = np.stack(all_dirs)

    split = int(num_views * split_ratio)

    def build(sl: slice) -> RayDataset:
        px, o, d = flatten_views(images[sl], all_oris[sl], all_dirs[sl])
        return RayDataset(
            pixels=px, origins=o, directions=d,
            near=near, far=far, focal=float(focal),
            height=target_height, width=target_width,
        )

    return build(slice(0, split)), build(slice(split, None)), (near, far), float(focal)
