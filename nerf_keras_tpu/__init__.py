"""nerf_keras_tpu — a TPU-native NeRF framework (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capabilities of the Keras/TensorFlow reference
``ghif/nerf-keras`` (see /root/repo/SURVEY.md): coarse+fine hierarchical-
sampling NeRF training on Blender-synthetic (Lego) and LLFF forward-facing
(Fern) scenes, data-parallel ray-batch training over a TPU device mesh,
checkpoint/resume (including optimizer state — an improvement over the
reference), per-epoch PSNR/loss tracking with rendered RGB/depth panels, and
spiral-path novel-view video rendering.

Architecture is TPU-first, not a port:

* pure-function JAX everywhere — pytree parameters, explicit PRNG keys,
  a single jitted train step (reference: Keras ``Model.fit`` machinery,
  models.py:64-149);
* per-step stratified ray sampling under ``jit`` (the reference freezes one
  shared jitter vector at dataset-build time, data_utils.py:156);
* SPMD over a ``jax.sharding.Mesh`` — ray batches sharded on a ``data``
  axis, optional tensor-parallel MLP sharding on a ``model`` axis, with XLA
  inserting the ICI collectives (reference: ``tf.distribute.TPUStrategy``,
  train_tpu_lego.py:72-82);
* a Pallas fused ray-march kernel for the hot path (positional encoding +
  8-layer MLP + alpha compositing with weights pinned in VMEM), behind a
  jnp reference implementation with parity tests.
"""

__version__ = "0.1.0"

from nerf_keras_tpu.config import NeRFConfig, load_config

__all__ = ["NeRFConfig", "load_config", "__version__"]
