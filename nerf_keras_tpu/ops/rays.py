"""Ray generation and camera-pose math.

Capability parity with reference data_utils.py:23-73 (``get_rays``,
``sample_rays``) and :225-267 (spherical pose construction).  Pure jnp,
shape-polymorphic, jit-safe; the pixel grid is built with
``broadcasted_iota``-style ops that lower cleanly to TPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_rays(height: int, width: int, focal, pose) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel ray origins and directions for a pinhole camera.

    Camera convention matches reference data_utils.py:36-52: pixel (u, v)
    maps to camera-space direction ``((u - W/2)/f, -(v - H/2)/f, -1)``,
    rotated by ``pose[:3, :3]``; the origin is ``pose[:3, 3]`` broadcast.

    Args:
        height, width: image dims (static).
        focal: focal length in pixels (scalar).
        pose: ``(3, 4)``-or-larger camera-to-world matrix.

    Returns:
        ``(origins, directions)``, each ``(H, W, 3)`` float32.
    """
    pose = jnp.asarray(pose, dtype=jnp.float32)
    focal = jnp.asarray(focal, dtype=jnp.float32)
    u = jnp.arange(width, dtype=jnp.float32)[None, :]  # (1, W)
    v = jnp.arange(height, dtype=jnp.float32)[:, None]  # (H, 1)
    x = (u - width * 0.5) / focal  # (1, W)
    y = -(v - height * 0.5) / focal  # (H, 1)
    dirs = jnp.stack(
        [
            jnp.broadcast_to(x, (height, width)),
            jnp.broadcast_to(y, (height, width)),
            -jnp.ones((height, width), dtype=jnp.float32),
        ],
        axis=-1,
    )  # (H, W, 3) camera-space
    rot = pose[:3, :3]
    # world dir_i = sum_j R[i, j] * d_j  (reference data_utils.py:48-50).
    # Elementwise broadcast+reduce, not a matmul: keeps full f32 precision
    # regardless of the backend's default matmul precision, and XLA fuses
    # a 3x3 contraction better this way than through the MXU.
    ray_dirs = jnp.sum(dirs[..., None, :] * rot, axis=-1)
    ray_oris = jnp.broadcast_to(pose[:3, -1], ray_dirs.shape)
    return ray_oris, ray_dirs


def sample_rays(
    ray_origins: jnp.ndarray, ray_directions: jnp.ndarray, t_vals: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Points along rays: ``o + d * t`` (reference data_utils.py:55-73).

    Args:
        ray_origins: ``(..., 3)``.
        ray_directions: ``(..., 3)``.
        t_vals: ``(..., S)``.

    Returns:
        ``(points, dirs)``: ``(..., S, 3)`` sample positions and the ray
        direction broadcast to the same shape (the per-sample view dir fed
        to the MLP's color branch).
    """
    points = (
        ray_origins[..., None, :]
        + ray_directions[..., None, :] * t_vals[..., :, None]
    )
    dirs = jnp.broadcast_to(ray_directions[..., None, :], points.shape)
    return points, dirs


# The single source of truth for the NDC projection near plane: the
# standard choice after LLFF bound rescaling (bd_factor=0.75 puts the
# closest bound at ~1.33, so the plane sits just inside it).  Training
# (data/pipeline.py:dataset_to_ndc) and rendering (Trainer.render_image)
# must agree on this value — a mismatch silently shifts where t'=0 lands.
NDC_NEAR_PLANE = 1.0


def ndc_rays(
    height: int,
    width: int,
    focal,
    near,
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reparameterize forward-facing rays into normalized device
    coordinates (the original NeRF's NDC treatment, paper appendix C).

    Absent from the reference entirely (SURVEY.md §2.2: "no NDC
    reparameterization anywhere in the repo") even though its Fern
    workload is the textbook case: forward-facing captures have unbounded
    depth, and linear-in-t sampling in world space wastes samples near
    the camera while undersampling the background.  In NDC the scene maps
    into the [-1, 1]^2 x [0, 1] cube and ``t in [0, 1]`` sweeps from the
    near plane to infinity with perspective-correct spacing.

    Derivation (standard pinhole projection P, camera facing -z):
    shift each origin to the near plane (``t = -(near + o_z) / d_z``),
    then project so the new ray ``o' + t' d'`` in NDC corresponds to the
    original world ray:

        o' = (-f/(W/2) * o_x/o_z,  -f/(H/2) * o_y/o_z,  1 + 2n/o_z)
        d' = (-f/(W/2) * (d_x/d_z - o_x/o_z),
              -f/(H/2) * (d_y/d_z - o_y/o_z),  -2n/o_z)

    Args:
        height, width: image dims the focal is expressed against.
        focal: focal length in pixels.
        near: world-space distance of the projection near plane (the
            standard choice after LLFF bound rescaling is 1.0).
        ray_origins / ray_directions: ``(..., 3)`` world rays with
            ``d_z < 0`` (forward-facing).

    Returns:
        ``(origins, directions)`` in NDC; sample with bounds [0, 1].
    """
    ray_origins = jnp.asarray(ray_origins, jnp.float32)
    ray_directions = jnp.asarray(ray_directions, jnp.float32)
    focal = jnp.asarray(focal, jnp.float32)
    near = jnp.asarray(near, jnp.float32)

    # Shift origins onto the near plane so t'=0 starts there.
    t = -(near + ray_origins[..., 2]) / ray_directions[..., 2]
    o = ray_origins + t[..., None] * ray_directions

    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = (
        ray_directions[..., 0],
        ray_directions[..., 1],
        ray_directions[..., 2],
    )
    sx = -focal / (0.5 * width)
    sy = -focal / (0.5 * height)
    o_ndc = jnp.stack(
        [sx * ox / oz, sy * oy / oz, 1.0 + 2.0 * near / oz], axis=-1
    )
    d_ndc = jnp.stack(
        [
            sx * (dx / dz - ox / oz),
            sy * (dy / dz - oy / oz),
            -2.0 * near / oz,
        ],
        axis=-1,
    )
    return o_ndc, d_ndc


# ---------------------------------------------------------------------------
# Spherical camera paths for novel-view rendering (reference data_utils.py:
# 225-267).  Host-side pose math — plain numpy, computed once per frame.
# ---------------------------------------------------------------------------


def get_translation_t(t: float) -> np.ndarray:
    """Translation along -z viewing axis by distance ``t``."""
    m = np.eye(4, dtype=np.float32)
    m[2, 3] = t
    return m


def get_rotation_phi(phi: float) -> np.ndarray:
    """Rotation about the x axis by ``phi`` radians."""
    c, s = np.cos(phi), np.sin(phi)
    m = np.eye(4, dtype=np.float32)
    m[1, 1], m[1, 2] = c, -s
    m[2, 1], m[2, 2] = s, c
    return m


def get_rotation_theta(theta: float) -> np.ndarray:
    """Rotation about the y axis by ``theta`` radians."""
    c, s = np.cos(theta), np.sin(theta)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 2] = c, -s
    m[2, 0], m[2, 2] = s, c
    return m


def pose_spherical(theta_deg: float, phi_deg: float, t: float) -> np.ndarray:
    """Camera-to-world matrix on a sphere (reference data_utils.py:258-267).

    ``theta_deg``/``phi_deg`` in degrees, ``t`` the orbit radius; includes
    the reference's final axis-flip matrix so poses are interchangeable.
    """
    c2w = get_translation_t(t)
    c2w = get_rotation_phi(phi_deg / 180.0 * np.pi) @ c2w
    c2w = get_rotation_theta(theta_deg / 180.0 * np.pi) @ c2w
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    )
    return flip @ c2w
