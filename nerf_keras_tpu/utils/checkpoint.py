"""Checkpoint save/restore with full training state.

Improves on the reference, which saves weights only — no optimizer state,
no step counter, so no true resume (SURVEY.md §5).  Format: a single
``.npz`` of the flattened TrainState pytree (keyed by tree path) written
through the storage abstraction, so local and ``gs://`` destinations both
work (the reference dual-paths every call site by hand,
train_lego.py:200-213).

Filename pattern mirrors the reference
(``nerf_l{L}_d{D}_n{NS}_ep{E}`` — train_lego.py:205).
"""

from __future__ import annotations

import io as _io
import json

import jax
import numpy as np

from nerf_keras_tpu.config import NeRFConfig, to_reference_json, config_from_dict
from nerf_keras_tpu.utils import io


def checkpoint_name(cfg: NeRFConfig) -> str:
    return (
        f"nerf_l{cfg.num_layers}_d{cfg.hidden_dim}"
        f"_n{cfg.ns_coarse + cfg.ns_fine}_ep{cfg.epochs}.ckpt.npz"
    )


def _flatten(state) -> dict[str, np.ndarray]:
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(state)[0]
    out = {}
    for path, leaf in leaves_with_paths:
        key = jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(
    path: str,
    state,
    cfg: NeRFConfig | None = None,
    scene: dict | None = None,
) -> None:
    """Write TrainState (params + bn + optimizer + step) to ``path``.

    ``scene`` carries dataset geometry the config alone can't recover —
    ``{"near": ..., "far": ..., "focal": ...}`` — stored in the sidecar so
    inference doesn't fall back to Lego-biased bounds for other scenes
    (the reference rebuilds the whole dataset just to recover these,
    inference.py:74-103).
    """
    arrays = _flatten(jax.device_get(state))
    buf = _io.BytesIO()
    np.savez(buf, **arrays)
    with io.open_file(path, "wb") as f:
        f.write(buf.getvalue())
    if cfg is not None:
        sidecar = to_reference_json(cfg)
        if scene is not None:
            sidecar["SCENE"] = {k.upper(): float(v) for k, v in scene.items()}
        cfg_path = path + ".config.json"
        with io.open_file(cfg_path, "w") as f:
            json.dump(sidecar, f, indent=2)


def load_checkpoint(path: str, template_state):
    """Restore into the structure of ``template_state`` (from
    ``init_train_state`` with the same config)."""
    with io.open_file(path, "rb") as f:
        data = np.load(_io.BytesIO(f.read()))
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template_state)
    new_leaves = []
    for tree_path, leaf in leaves_with_paths:
        key = jax.tree_util.keystr(tree_path)
        if key not in data:
            raise KeyError(f"checkpoint at {path} missing leaf {key}")
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"shape mismatch for {key}: checkpoint {arr.shape} vs "
                f"template {np.shape(leaf)} — wrong config?"
            )
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_checkpoint_config(path: str) -> NeRFConfig:
    with io.open_file(path + ".config.json", "r") as f:
        raw = json.load(f)
    raw.pop("SCENE", None)
    return config_from_dict(raw)


def load_checkpoint_scene(path: str) -> dict | None:
    """Recover ``{"near", "far", "focal"}`` from the sidecar, or None for
    checkpoints written before the sidecar carried scene geometry."""
    sidecar = path + ".config.json"
    if not io.exists(sidecar):
        return None
    with io.open_file(sidecar, "r") as f:
        scene = json.load(f).get("SCENE")
    if scene is None:
        return None
    return {k.lower(): float(v) for k, v in scene.items()}


def latest_checkpoint(run_dir: str) -> str | None:
    """Newest ``*.ckpt.npz`` in a run directory, or None."""
    if not io.exists(run_dir):
        return None
    names = [n for n in io.listdir(run_dir) if n.endswith(".ckpt.npz")]
    if not names:
        return None
    return io.join(run_dir, sorted(names)[-1])
