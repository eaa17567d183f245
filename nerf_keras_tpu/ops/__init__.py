"""Core NeRF ops: pure jnp functions (the contract layer).

TPU-native counterpart of the reference's data_utils.py compute core
(SURVEY.md §2.1).  Everything here is shape-polymorphic over leading batch
dims, jit/vmap/grad-safe, and PRNG-key-driven.
"""

from nerf_keras_tpu.ops.encoding import encode_position
from nerf_keras_tpu.ops.rays import (
    get_rays,
    ndc_rays,
    sample_rays,
    pose_spherical,
    get_translation_t,
    get_rotation_phi,
    get_rotation_theta,
)
from nerf_keras_tpu.ops.volume import (
    composite_background,
    distortion_loss,
    volume_render,
)
from nerf_keras_tpu.ops.sampling import generate_t_vals, sample_pdf, sorted_union

__all__ = [
    "encode_position",
    "get_rays",
    "ndc_rays",
    "sample_rays",
    "pose_spherical",
    "get_translation_t",
    "get_rotation_phi",
    "get_rotation_theta",
    "volume_render",
    "composite_background",
    "distortion_loss",
    "generate_t_vals",
    "sample_pdf",
    "sorted_union",
]
