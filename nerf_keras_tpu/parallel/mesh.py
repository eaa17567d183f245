"""Device mesh and sharding rules for NeRF training.

Design (SURVEY.md §2.6 "TPU-native equivalent"):

* 2-D logical mesh ``(data, model)``.  ``data`` shards the flat ray batch —
  the NeRF analogue of data parallelism; every ray is independent, so this
  axis scales to any chip count with one gradient allreduce per step.
* ``model`` (optional, default 1) tensor-parallels the MLP in Megatron
  style: even trunk layers split their output features (column-parallel),
  odd layers split input features (row-parallel), so activations alternate
  sharded/replicated and XLA inserts a single reduce per pair over ICI.
* multi-host: the same mesh spans hosts transparently
  (``jax.distributed.initialize`` is called by the launcher; DCN handled by
  the standard device order).

All collectives are emitted by the GSPMD partitioner from these
annotations; there is no hand-written ``psum`` in the train step.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build the ``(data, model)`` mesh.

    Args:
        data: size of the data axis; -1 means "all remaining devices".
        model: size of the tensor-parallel axis.
        devices: device list override (defaults to ``jax.devices()``).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model <= 0:
        raise ValueError(f"model axis size must be >= 1, got {model}")
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data <= 0:
        # Only -1 means "infer"; 0 or other negatives would silently
        # reshape into an EMPTY mesh (numpy treats any negative dim as
        # infer) and die later with a bare ZeroDivisionError.
        raise ValueError(f"data axis size must be >= 1 or -1, got {data}")
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Flat ray batches shard their leading (ray) dim over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def nerf_param_shardings(mesh: Mesh, params: Any) -> Any:
    """PartitionSpec pytree for a {'coarse': ..., 'fine': ...} param tree
    (or {'proposal': ..., 'fine': ...} when train_sampler='proposal').

    With ``model == 1`` everything is replicated.  With ``model > 1`` the
    trunk alternates column-/row-parallel; heads follow the trunk's final
    layout; tiny output heads stay replicated (their cost is negligible and
    replication avoids a gather before volume rendering).
    """
    tp = mesh.shape[MODEL_AXIS]

    def col(w) -> P:
        """Column-parallel if the output dim divides; else replicate."""
        return P(None, MODEL_AXIS) if tp > 1 and w.shape[1] % tp == 0 else P()

    def row(w) -> P:
        """Row-parallel if the input dim divides; else replicate.

        Skip-concat layers have in_dim = hidden + xyz_dim (e.g. 319/127),
        which rarely divides — those fall back to replication and GSPMD
        re-shards the activation as needed.
        """
        return P(MODEL_AXIS, None) if tp > 1 and w.shape[0] % tp == 0 else P()

    def one_mlp(mlp: dict) -> dict:
        if "trunk" not in mlp:
            # Tiny proposal net or {'l1','l2'} chain (ops/proposal.py;
            # train_sampler='proposal'): ~30 KB of params per level —
            # replicate everywhere, its matmuls are negligible and
            # replication avoids any collective in the sampling chain.
            return jax.tree_util.tree_map(lambda _: P(), mlp)
        out: dict = {"trunk": []}
        for i, layer in enumerate(mlp["trunk"]):
            # Megatron-style alternation: even layers column-split (sharded
            # activations out), odd layers row-split (one psum back to
            # replicated) — degraded to replication where dims don't divide.
            wspec = col(layer["w"]) if i % 2 == 0 else row(layer["w"])
            bspec = P(MODEL_AXIS) if wspec == P(None, MODEL_AXIS) else P()
            spec = {"w": wspec, "b": bspec}
            for extra in ("gamma", "beta"):
                if extra in layer:
                    spec[extra] = bspec
            out["trunk"].append(spec)
        out["sigma"] = {"w": row(mlp["sigma"]["w"]), "b": P()}
        fspec = col(mlp["feature"]["w"])
        out["feature"] = {
            "w": fspec,
            "b": P(MODEL_AXIS) if fspec == P(None, MODEL_AXIS) else P(),
        }
        branch = {"w": P(), "b": P()}
        for extra in ("gamma", "beta"):
            if extra in mlp["branch"]:
                branch[extra] = P()
        out["branch"] = branch
        out["rgb"] = {"w": P(), "b": P()}
        return out

    return {name: one_mlp(mlp) for name, mlp in params.items()}


def specs_to_shardings(mesh: Mesh, specs: Any) -> Any:
    """Map a PartitionSpec pytree to NamedSharding leaves."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch onto the mesh, leading dim over ``data``.

    SINGLE-PROCESS only: device_put of host arrays cannot address other
    hosts' devices.  Multi-host callers must go through
    ``Trainer.put_batch`` (jax.make_array_from_process_local_data).
    """
    if jax.process_count() > 1:
        raise RuntimeError(
            "shard_batch is single-process only; use Trainer.put_batch "
            "for multi-host batch assembly"
        )
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
