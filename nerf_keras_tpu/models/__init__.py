"""Model zoo: the NeRF skip-MLP as pure functions over pytree params."""

from nerf_keras_tpu.models.mlp import (
    init_nerf_params,
    init_bn_state,
    apply_nerf_mlp,
    param_count,
    trunk_input_dims,
)

__all__ = [
    "init_nerf_params",
    "init_bn_state",
    "apply_nerf_mlp",
    "param_count",
    "trunk_input_dims",
]
