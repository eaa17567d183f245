"""Ray-batch input pipeline.

Replaces the reference's tf.data pipeline (data_utils.py:140-170).  Design
differences, all deliberate (SURVEY.md §7):

* batches carry only ``(pixels, origins, directions)`` — t-values are drawn
  per step on device from a PRNG key (the reference precomputes one frozen
  jitter at dataset-build time and ships ``(B, NS_COARSE)`` t-values with
  every batch);
* shuffling is a full permutation per epoch (the reference uses a
  ``batch*5`` shuffle buffer, an approximation);
* ``drop_remainder`` semantics match the reference (static shapes for jit);
* per-host sharding for multi-host meshes: each process iterates its own
  contiguous slice of the ray set with a shared epoch seed.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np


@dataclasses.dataclass
class RayDataset:
    """Flattened per-pixel ray rows (the reference's layout,
    lego_data_utils.py:39-46): pixel rgb, ray origin, ray direction."""

    pixels: np.ndarray  # (N, 3) float32 in [0, 1]
    origins: np.ndarray  # (N, 3) float32
    directions: np.ndarray  # (N, 3) float32
    near: float
    far: float
    focal: float
    height: int
    width: int

    def __post_init__(self):
        n = self.pixels.shape[0]
        if self.origins.shape[0] != n or self.directions.shape[0] != n:
            raise ValueError("pixels/origins/directions row counts differ")

    def __len__(self) -> int:
        return self.pixels.shape[0]

    @property
    def num_images(self) -> int:
        return len(self) // (self.height * self.width)

    def image(self, i: int) -> np.ndarray:
        """Recover image ``i`` (H, W, 3) from the flat layout."""
        hw = self.height * self.width
        return self.pixels[i * hw : (i + 1) * hw].reshape(
            self.height, self.width, 3
        )

    def image_rays(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        hw = self.height * self.width
        sl = slice(i * hw, (i + 1) * hw)
        return self.origins[sl], self.directions[sl]

    def process_slice(self, process_index: int, process_count: int) -> "RayDataset":
        """Contiguous per-host shard for multi-host training."""
        n = len(self) // process_count
        sl = slice(process_index * n, (process_index + 1) * n)
        return dataclasses.replace(
            self,
            pixels=self.pixels[sl],
            origins=self.origins[sl],
            directions=self.directions[sl],
        )


def iterate_batches(
    dataset: RayDataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    epoch: int = 0,
    drop_remainder: bool = True,
) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield ``(pixels, origins, directions)`` batches for one epoch.

    A fresh permutation is derived from ``(seed, epoch)`` so every process
    in a multi-host job shuffles identically over its own shard.
    """
    n = len(dataset)
    if shuffle:
        order = np.random.default_rng((seed, epoch)).permutation(n)
    else:
        order = np.arange(n)
    end = n - (n % batch_size) if drop_remainder else n
    for start in range(0, end, batch_size):
        idx = order[start : start + batch_size]
        yield (
            dataset.pixels[idx],
            dataset.origins[idx],
            dataset.directions[idx],
        )


def steps_per_epoch(dataset: RayDataset, batch_size: int) -> int:
    return len(dataset) // batch_size


def flatten_views(
    images: np.ndarray, origins: np.ndarray, directions: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(V, H, W, 3) stacks -> per-pixel rows (V*H*W, 3), reference layout."""
    return (
        images.reshape(-1, images.shape[-1]).astype(np.float32),
        origins.reshape(-1, 3).astype(np.float32),
        directions.reshape(-1, 3).astype(np.float32),
    )


def rescale_focal(
    focal: float, src_h: int, src_w: int, dst_h: int, dst_w: int
) -> float:
    """Focal length after resizing (src_h, src_w) images to (dst_h, dst_w).

    A pixel's angular extent scales with resolution, so the focal must
    scale with the resize ratio; a single focal is only exact for
    isotropic resizes — the geometric-mean ratio is used for anisotropic
    ones (the resized image is geometrically distorted either way).
    Fixes a reference defect it applies to BOTH its loaders: images are
    resized to the config resolution but the native-resolution focal is
    kept (lego_data_utils.py:23 vs :29; fern_data_utils.py:477-483), so
    rays span the wrong field of view and multi-view supervision is
    geometrically inconsistent at any non-native resolution.
    """
    import math

    return float(focal) * math.sqrt((dst_h / src_h) * (dst_w / src_w))


def build_ray_dataset(
    images: np.ndarray,
    poses,
    height: int,
    width: int,
    focal: float,
    near: float,
    far: float,
) -> RayDataset:
    """(V, H, W, 3) images + per-view camera poses -> flattened RayDataset
    (the pose-loop -> get_rays -> flatten pipeline every loader shares)."""
    from nerf_keras_tpu.ops.rays import get_rays

    oris, dirs = [], []
    for pose in poses:
        o, d = get_rays(height, width, focal, pose)
        oris.append(np.asarray(o))
        dirs.append(np.asarray(d))
    px, o, d = flatten_views(images, np.stack(oris), np.stack(dirs))
    return RayDataset(
        pixels=px, origins=o, directions=d,
        near=near, far=far, focal=float(focal),
        height=height, width=width,
    )


def dataset_to_ndc(ds: RayDataset, near_plane: float | None = None) -> RayDataset:
    """Reparameterize a forward-facing ray dataset into NDC
    (ops/rays.py:ndc_rays; NeRFConfig.ndc).  Bounds become [0, 1]: t'=0
    is the world-space ``near_plane`` (default: the shared
    ops/rays.py:NDC_NEAR_PLANE — rendering assumes the same value),
    t'=1 is infinity."""
    import dataclasses

    from nerf_keras_tpu.ops.rays import NDC_NEAR_PLANE, ndc_rays

    if near_plane is None:
        near_plane = NDC_NEAR_PLANE

    o, d = ndc_rays(
        ds.height, ds.width, ds.focal, near_plane, ds.origins, ds.directions
    )
    return dataclasses.replace(
        ds,
        origins=np.asarray(o, np.float32),
        directions=np.asarray(d, np.float32),
        near=0.0,
        far=1.0,
    )
