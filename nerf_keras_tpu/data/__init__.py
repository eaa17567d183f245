"""Datasets and the ray-batch input pipeline.

Counterpart of the reference's loader layer (lego_data_utils.py,
fern_data_utils.py) and its tf.data pipeline (data_utils.py:140-170),
rebuilt without TensorFlow: numpy host pipeline, PIL-based minification,
per-host sharding hooks for multi-host meshes.
"""

from nerf_keras_tpu.data.pipeline import RayDataset, iterate_batches
from nerf_keras_tpu.data.synthetic import prepare_synthetic_data
from nerf_keras_tpu.data.lego import prepare_lego_data
from nerf_keras_tpu.data.blender import prepare_blender_data
from nerf_keras_tpu.data.llff import prepare_fern_data, load_llff_data

__all__ = [
    "RayDataset",
    "iterate_batches",
    "prepare_synthetic_data",
    "prepare_lego_data",
    "prepare_blender_data",
    "prepare_fern_data",
    "load_llff_data",
]
