"""SPMD parallelism: device mesh construction and sharding rules.

TPU-native replacement for the reference's ``tf.distribute.TPUStrategy``
data parallelism (reference train_tpu_lego.py:72-82, SURVEY.md §2.6):
an explicit ``jax.sharding.Mesh`` with a ``data`` axis (ray batches) and an
optional ``model`` axis (tensor-parallel MLP).  Gradient allreduce is
emitted by XLA's SPMD partitioner over ICI — no hand-written collectives in
the training path.
"""

from nerf_keras_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    nerf_param_shardings,
    shard_batch,
)
from nerf_keras_tpu.parallel.distributed import (
    maybe_initialize,
    process_info,
    shard_dataset_for_process,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "nerf_param_shardings",
    "shard_batch",
    "maybe_initialize",
    "process_info",
    "shard_dataset_for_process",
]
