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


# Multi-object scene ("spheres"): four spheres of distinct albedo plus a
# checkered ground disk, with hard cast shadows.  Occlusions, multiple
# density modes per ray, and shadow boundaries make it a much harder
# placement problem than the single sphere — used to validate sampler
# recipes (e.g. the proposal-training quality matrix) beyond the trivially
# unimodal scene.  All geometry stays within [near+0.2, far) of every
# orbit camera (radius 4, bounds 2/6).
_SPHERES = (
    # (center, radius, albedo)
    ((0.00, 0.00, 0.10), 0.70, (0.90, 0.45, 0.10)),
    ((1.00, 0.70, 0.20), 0.45, (0.20, 0.40, 0.90)),
    ((-0.90, 0.80, -0.35), 0.40, (0.20, 0.80, 0.30)),
    ((0.20, -1.10, 0.45), 0.35, (0.85, 0.15, 0.50)),
)
_FLOOR_Z = -0.90          # ground disk height
_FLOOR_R = 1.75           # disk radius (keeps every point < far from cameras)
_CHECKER = 0.70           # checker period
_LIGHT = (0.57735, 0.57735, 0.57735)


def _shadow_mask(points: np.ndarray, eps: float = 1e-3) -> np.ndarray:
    """True where the point's view of the light is blocked by a sphere."""
    light = np.asarray(_LIGHT)
    o = points + eps * light
    blocked = np.zeros(points.shape[0], dtype=bool)
    for center, radius, _ in _SPHERES:
        oc = o - np.asarray(center)
        b = oc @ light
        c = np.sum(oc * oc, axis=-1) - radius**2
        disc = b * b - c
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        blocked |= (disc > 0) & (t > eps)
    return blocked


def _render_analytic_spheres(
    origins: np.ndarray, dirs: np.ndarray
) -> np.ndarray:
    """Exact nearest-hit render of the multi-object scene on white."""
    o = origins.reshape(-1, 3).astype(np.float64)
    d = dirs.reshape(-1, 3).astype(np.float64)
    n_rays = o.shape[0]

    best_t = np.full(n_rays, np.inf)
    albedo = np.ones((n_rays, 3))
    normal = np.zeros((n_rays, 3))

    dd = np.sum(d * d, axis=-1)
    for center, radius, color in _SPHERES:
        oc = o - np.asarray(center)
        b = np.sum(oc * d, axis=-1)
        c = np.sum(oc * oc, axis=-1) - radius**2
        disc = b * b - dd * c
        t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0.0))) / dd, np.inf)
        closer = (t > 1e-6) & (t < best_t)
        point = o + d * np.where(np.isfinite(t), t, 0.0)[:, None]
        n = (point - np.asarray(center)) / radius
        best_t = np.where(closer, t, best_t)
        albedo = np.where(closer[:, None], np.asarray(color), albedo)
        normal = np.where(closer[:, None], n, normal)

    # Ground disk: z = _FLOOR_Z, radius _FLOOR_R, coarse checkerboard.
    denom = d[:, 2]
    t_pl = np.where(
        np.abs(denom) > 1e-8, (_FLOOR_Z - o[:, 2]) / np.where(denom == 0, 1, denom), np.inf
    )
    p_pl = o + d * np.where(np.isfinite(t_pl), t_pl, 0.0)[:, None]
    on_disk = p_pl[:, 0] ** 2 + p_pl[:, 1] ** 2 < _FLOOR_R**2
    closer = (t_pl > 1e-6) & (t_pl < best_t) & on_disk
    check = (
        np.floor(p_pl[:, 0] / _CHECKER) + np.floor(p_pl[:, 1] / _CHECKER)
    ).astype(np.int64) % 2
    floor_col = np.where(check[:, None] == 0, 0.85, 0.50) * np.ones(3)
    best_t = np.where(closer, t_pl, best_t)
    albedo = np.where(closer[:, None], floor_col, albedo)
    normal = np.where(
        closer[:, None], np.asarray([0.0, 0.0, 1.0]), normal
    )

    hit = np.isfinite(best_t)
    point = o + d * np.where(hit, best_t, 0.0)[:, None]
    light = np.asarray(_LIGHT)
    diffuse = np.clip(normal @ light, 0.0, 1.0)
    diffuse = np.where(_shadow_mask(point), 0.0, diffuse)
    rgb = albedo * (0.25 + 0.75 * diffuse[:, None])
    rgb = np.where(hit[:, None], rgb, np.ones(3))
    return rgb.reshape(*origins.shape[:-1], 3).astype(np.float32)


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
    scene: str = "sphere",
    holdout: str | None = None,
) -> tuple[RayDataset, RayDataset, tuple[float, float], float]:
    """Build train/val RayDatasets of a procedural scene.

    ``scene="sphere"`` (default) is the original single diffuse sphere;
    ``scene="spheres"`` is the harder multi-object variant (four spheres +
    checkered ground disk, occlusions and cast shadows) used to validate
    sampler recipes beyond the unimodal case.

    ``holdout`` picks the val views: ``"tail"`` = last 20% by index (the
    reference Lego loader's protocol, lego_data_utils.py:26) — on an
    azimuth-ordered orbit that holds out a contiguous ~72 deg sector, so
    for a non-symmetric scene val measures EXTRAPOLATION into an unseen
    sector (measured: spheres-scene val declines while train climbs);
    ``"interleave"`` spreads the val views over the orbit so val measures
    novel-view interpolation.  Default: "tail" for the rotationally
    symmetric sphere (parity protocol), "interleave" for spheres.

    Returns ``(train, val, (near, far), focal)`` — same contract as
    :func:`nerf_keras_tpu.data.lego.prepare_lego_data`.
    """
    renderers = {
        "sphere": _render_analytic,
        "spheres": _render_analytic_spheres,
    }
    if scene not in renderers:
        raise ValueError(
            f"unknown synthetic scene {scene!r}; choose from {sorted(renderers)}"
        )
    render = renderers[scene]
    if holdout is None:
        holdout = "interleave" if scene == "spheres" else "tail"
    if holdout not in ("tail", "interleave"):
        raise ValueError(f"unknown holdout {holdout!r}")
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
        images.append(render(oris, dirs))
        all_oris.append(oris)
        all_dirs.append(dirs)

    images = np.stack(images)
    all_oris = np.stack(all_oris)
    all_dirs = np.stack(all_dirs)

    split = int(num_views * split_ratio)
    n_val = num_views - split
    if holdout == "interleave":
        stride = max(1, num_views // max(n_val, 1))
        val_idx = np.arange(num_views)[stride - 1 :: stride][:n_val]
    else:
        val_idx = np.arange(split, num_views)
    train_idx = np.setdiff1d(np.arange(num_views), val_idx)

    def build(idx: np.ndarray) -> RayDataset:
        px, o, d = flatten_views(images[idx], all_oris[idx], all_dirs[idx])
        return RayDataset(
            pixels=px, origins=o, directions=d,
            near=near, far=far, focal=float(focal),
            height=target_height, width=target_width,
        )

    return build(train_idx), build(val_idx), (near, far), float(focal)
