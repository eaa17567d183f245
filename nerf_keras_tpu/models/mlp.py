"""The NeRF MLP as a pure function over a pytree of parameters.

Architecture parity with reference models.py:24-62
(``create_nerf_complete_model``): ``num_layers`` trunk Dense+ReLU layers of
width ``hidden_dim`` over the 63-wide encoded position, with the raw encoded
position concatenated back in after layer ``i`` whenever
``i % skip_layer == 0 and i > 0``; a linear 1-wide sigma head off the trunk;
a 256-wide feature layer concatenated with the 27-wide encoded direction
into a ``hidden_dim // 2`` ReLU branch and a linear 3-wide rgb head; output
``concat(rgb, sigma)`` of width 4.  Activations (sigmoid/relu) are applied
later in ``volume_render``, as in the reference.  The optional BatchNorm
variant (Dense→BN→ReLU, models.py:30-33) is supported with explicit running
statistics — two of the six shipped configs enable it.

TPU-native design notes:

* parameters are a plain nested dict pytree; initialization matches Keras
  Dense defaults (glorot-uniform weights, zero biases) closely enough for
  behavioral parity;
* matmuls run in a configurable compute dtype (bfloat16 by default) with
  float32 accumulation (``preferred_element_type``) — this is what keeps
  the MXU at full rate; parameters and the composited outputs stay float32;
* the hot call operates on ``(N, feat)`` flattened points so XLA sees large
  static-shape matmuls it can tile onto the 128x128 systolic array.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]
BNState = dict[str, Any] | None

_BN_MOMENTUM = 0.99  # keras BatchNormalization default
_BN_EPS = 1e-3  # keras BatchNormalization default


def trunk_input_dims(
    num_layers: int, hidden_dim: int, skip_layer: int, xyz_dim: int
) -> list[int]:
    """Input width of each trunk layer, accounting for skip concats.

    The reference concatenates the raw encoded position back in *after*
    layer ``i`` when ``i % skip_layer == 0 and i > 0`` (models.py:38-39),
    so layer ``i+1`` consumes ``hidden_dim + xyz_dim``.
    """
    dims = []
    for i in range(num_layers):
        if i == 0:
            dims.append(xyz_dim)
        elif (i - 1) % skip_layer == 0 and (i - 1) > 0:
            dims.append(hidden_dim + xyz_dim)
        else:
            dims.append(hidden_dim)
    return dims


def head_input_dim(
    num_layers: int, hidden_dim: int, skip_layer: int, xyz_dim: int
) -> int:
    """Input width of the sigma/feature heads: the concatenated width when
    the FINAL trunk layer is itself a skip layer (reference functional
    graph, models.py:38-45).  Single source of truth — the subtlest piece
    of architecture parity; init, the legacy variant and the Keras
    importer all consume it."""
    last = num_layers - 1
    if last % skip_layer == 0 and last > 0:
        return hidden_dim + xyz_dim
    return hidden_dim


def _glorot_uniform(key: jax.Array, shape: tuple[int, int]) -> jnp.ndarray:
    fan_in, fan_out = shape
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(
        key, shape, minval=-limit, maxval=limit, dtype=jnp.float32
    )


def _dense_init(key: jax.Array, in_dim: int, out_dim: int) -> dict:
    return {
        "w": _glorot_uniform(key, (in_dim, out_dim)),
        "b": jnp.zeros((out_dim,), dtype=jnp.float32),
    }


def init_nerf_params(
    key: jax.Array,
    num_layers: int = 8,
    hidden_dim: int = 256,
    skip_layer: int = 4,
    l_xyz: int = 10,
    l_dir: int = 4,
    batch_norm: bool = False,
) -> Params:
    """Initialize one NeRF MLP (the reference instantiates two: coarse+fine)."""
    xyz_dim = 3 + 2 * 3 * l_xyz
    dir_dim = 3 + 2 * 3 * l_dir
    dims = trunk_input_dims(num_layers, hidden_dim, skip_layer, xyz_dim)

    keys = jax.random.split(key, num_layers + 4)
    trunk = []
    for i, in_dim in enumerate(dims):
        layer = _dense_init(keys[i], in_dim, hidden_dim)
        if batch_norm:
            layer["gamma"] = jnp.ones((hidden_dim,), dtype=jnp.float32)
            layer["beta"] = jnp.zeros((hidden_dim,), dtype=jnp.float32)
        trunk.append(layer)

    head_in = head_input_dim(num_layers, hidden_dim, skip_layer, xyz_dim)

    branch = _dense_init(keys[num_layers + 2], hidden_dim + dir_dim, hidden_dim // 2)
    if batch_norm:
        branch["gamma"] = jnp.ones((hidden_dim // 2,), dtype=jnp.float32)
        branch["beta"] = jnp.zeros((hidden_dim // 2,), dtype=jnp.float32)

    return {
        "trunk": trunk,
        "sigma": _dense_init(keys[num_layers], head_in, 1),
        "feature": _dense_init(keys[num_layers + 1], head_in, hidden_dim),
        "branch": branch,
        "rgb": _dense_init(keys[num_layers + 3], hidden_dim // 2, 3),
    }


def init_bn_state(params: Params) -> BNState:
    """Zero-mean/unit-var running stats for the BatchNorm variant."""
    if "gamma" not in params["trunk"][0]:
        return None

    def stats(width: int) -> dict:
        return {
            "mean": jnp.zeros((width,), dtype=jnp.float32),
            "var": jnp.ones((width,), dtype=jnp.float32),
        }

    return {
        "trunk": [stats(l["gamma"].shape[0]) for l in params["trunk"]],
        "branch": stats(params["branch"]["gamma"].shape[0]),
    }


def _dense(x: jnp.ndarray, layer: dict, compute_dtype: jnp.dtype) -> jnp.ndarray:
    """x @ w + b with MXU-friendly mixed precision (f32 accumulation).

    With compute_dtype=float32 the matmul is forced to HIGHEST precision so
    parity tests see true f32 (the backend default may otherwise run f32
    dots through bf16 passes).
    """
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    y = jnp.dot(
        x.astype(compute_dtype),
        layer["w"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return y + layer["b"]


def _batch_norm(
    x: jnp.ndarray, layer: dict, state: dict, train: bool
) -> tuple[jnp.ndarray, dict]:
    """Keras-default BatchNorm over all axes but the last."""
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        new_state = {
            "mean": _BN_MOMENTUM * state["mean"] + (1 - _BN_MOMENTUM) * mean,
            "var": _BN_MOMENTUM * state["var"] + (1 - _BN_MOMENTUM) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + _BN_EPS) * layer["gamma"]
    return (x - mean) * inv + layer["beta"], new_state


def apply_nerf_mlp(
    params: Params,
    x_enc: jnp.ndarray,
    d_enc: jnp.ndarray,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    skip_layer: int = 4,
    bn_state: BNState = None,
    train: bool = False,
) -> tuple[jnp.ndarray, BNState]:
    """Evaluate the MLP on encoded positions/directions.

    Args:
        params: pytree from :func:`init_nerf_params`.
        x_enc: ``(..., xyz_dim)`` encoded sample positions.
        d_enc: ``(..., dir_dim)`` encoded view directions.
        compute_dtype: matmul dtype (bfloat16 for MXU rate, float32 for
            parity tests).
        skip_layer: skip-concat period (reference models.py:38).
        bn_state: running stats when the BatchNorm variant is active.
        train: BatchNorm mode selector (batch stats vs running stats).

    Returns:
        ``(preds, new_bn_state)`` where preds is ``(..., 4)`` float32 raw
        ``[rgb_logits, sigma]``.
    """
    use_bn = "gamma" in params["trunk"][0]
    if use_bn and bn_state is None:
        raise ValueError(
            "params carry BatchNorm parameters but bn_state is None — "
            "pass init_bn_state(params) (or the trained running stats)"
        )
    new_bn: dict | None = {"trunk": []} if use_bn else None

    x = x_enc
    for i, layer in enumerate(params["trunk"]):
        h = _dense(x, layer, compute_dtype)
        if use_bn:
            h, st = _batch_norm(h, layer, bn_state["trunk"][i], train)
            new_bn["trunk"].append(st)
        h = jnp.maximum(h, 0.0)
        if i % skip_layer == 0 and i > 0:
            x = jnp.concatenate([h, x_enc.astype(h.dtype)], axis=-1)
        else:
            x = h

    sigma = _dense(x, params["sigma"], compute_dtype)
    feature = _dense(x, params["feature"], compute_dtype)
    feature = jnp.concatenate([feature, d_enc.astype(feature.dtype)], axis=-1)
    h = _dense(feature, params["branch"], compute_dtype)
    if use_bn:
        h, st = _batch_norm(h, params["branch"], bn_state["branch"], train)
        new_bn["branch"] = st
    h = jnp.maximum(h, 0.0)
    rgb = _dense(h, params["rgb"], compute_dtype)

    preds = jnp.concatenate([rgb, sigma], axis=-1).astype(jnp.float32)
    return preds, new_bn


def apply_nerf_sigma(
    params: Params,
    x_enc: jnp.ndarray,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    skip_layer: int = 4,
    bn_state: BNState = None,
) -> jnp.ndarray:
    """Density-only evaluation: trunk + sigma head, no view branch.

    Sigma is direction-independent by construction (the head reads the
    trunk output BEFORE the direction concat — reference models.py:41-47),
    so callers that only need density (proposal-sampler distillation,
    occupancy probes) can skip the feature/branch/rgb matmuls entirely.
    BatchNorm models run in inference mode (running stats).

    Returns raw ``(...,)`` float32 sigma logits (pre-relu, matching
    ``preds[..., 3]`` of :func:`apply_nerf_mlp`).
    """
    use_bn = "gamma" in params["trunk"][0]
    if use_bn and bn_state is None:
        raise ValueError(
            "params carry BatchNorm parameters but bn_state is None — "
            "pass the trained running stats"
        )
    x = x_enc
    for i, layer in enumerate(params["trunk"]):
        h = _dense(x, layer, compute_dtype)
        if use_bn:
            h, _ = _batch_norm(h, layer, bn_state["trunk"][i], False)
        h = jnp.maximum(h, 0.0)
        if i % skip_layer == 0 and i > 0:
            x = jnp.concatenate([h, x_enc.astype(h.dtype)], axis=-1)
        else:
            x = h
    return _dense(x, params["sigma"], compute_dtype)[..., 0].astype(jnp.float32)


def param_count(params: Params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Legacy single-input variant (reference ``create_nerf_model``,
# models.py:11-22): one encoded-position input, skip-concat hardcoded every
# 4 layers, single Dense(4) [rgb, sigma] head, no view-direction branch.
# The reference ships it unused; kept for inventory parity (SURVEY.md §2.3).
# ---------------------------------------------------------------------------


def init_simple_nerf_params(
    key: jax.Array,
    num_layers: int = 8,
    hidden_dim: int = 256,
    l_xyz: int = 10,
) -> Params:
    """Initialize the legacy single-input MLP (skip period fixed at 4)."""
    xyz_dim = 3 + 2 * 3 * l_xyz
    dims = trunk_input_dims(num_layers, hidden_dim, 4, xyz_dim)
    keys = jax.random.split(key, num_layers + 1)
    trunk = [
        _dense_init(keys[i], in_dim, hidden_dim) for i, in_dim in enumerate(dims)
    ]
    head_in = head_input_dim(num_layers, hidden_dim, 4, xyz_dim)
    return {"trunk": trunk, "head": _dense_init(keys[num_layers], head_in, 4)}


def apply_simple_nerf_mlp(
    params: Params,
    x_enc: jnp.ndarray,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Evaluate the legacy MLP: ``(..., xyz_dim) -> (..., 4)`` raw
    [rgb_logits, sigma] (activations applied later in volume_render)."""
    x = x_enc
    for i, layer in enumerate(params["trunk"]):
        h = jnp.maximum(_dense(x, layer, compute_dtype), 0.0)
        if i % 4 == 0 and i > 0:
            x = jnp.concatenate([h, x_enc.astype(h.dtype)], axis=-1)
        else:
            x = h
    return _dense(x, params["head"], compute_dtype).astype(jnp.float32)
