"""Importer for the reference's Keras ``.weights.h5`` checkpoints.

The reference saves ``NeRFTrainer.save_weights(...*.weights.h5)`` each
epoch (reference train_lego.py:205,213).  Keras 3 lays the file out as::

    /coarse_model/layers/dense/vars/{0: kernel, 1: bias}
    /coarse_model/layers/dense_1/vars/...
    /coarse_model/layers/batch_normalization/vars/{0: gamma, 1: beta,
                                                   2: moving_mean,
                                                   3: moving_var}
    /fine_model/layers/...

(top-level group names are the trainer's attribute names,
reference models.py:67-68; layer group names are assigned in the model's
layer-walk order — depth order, NOT creation order, so the four heads
appear as feature, branch, rgb, sigma).  Layout verified against
keras 3.13 ``save_weights`` output for the reference architecture, with
and without BatchNorm.

This module maps that file onto our params pytree
(:func:`nerf_keras_tpu.models.mlp.init_nerf_params` layout) so PSNR parity
against a reference-trained model is provable the moment reference
weights are available (BASELINE.md quality target).  Trunk layers are
taken in walk order (they precede the heads, being their graph
ancestors); the four head layers are matched by their unique kernel
shapes, which makes the import robust to walk-order differences between
keras versions.
"""

from __future__ import annotations

import re

import numpy as np

from nerf_keras_tpu.config import NeRFConfig
from nerf_keras_tpu.models.mlp import head_input_dim, trunk_input_dims


def _nat_index(name: str) -> int:
    """'dense' -> 0, 'dense_7' -> 7 (keras auto-naming order)."""
    m = re.search(r"_(\d+)$", name)
    return int(m.group(1)) if m else 0


def _collect(group) -> tuple[list[list[np.ndarray]], list[list[np.ndarray]]]:
    """Gather (dense_layers, bn_layers) var lists in walk order from one
    model group (e.g. file['coarse_model'])."""
    layers = group["layers"] if "layers" in group else group
    dense, bn = [], []
    for name in layers:
        sub = layers[name]
        if "vars" not in sub:
            continue
        arrs = [
            np.asarray(sub["vars"][k])
            for k in sorted(sub["vars"], key=int)
        ]
        if name.startswith("dense"):
            dense.append((_nat_index(name), arrs))
        elif name.startswith("batch_normalization"):
            bn.append((_nat_index(name), arrs))
    dense.sort(key=lambda t: t[0])
    bn.sort(key=lambda t: t[0])
    return [a for _, a in dense], [a for _, a in bn]


def _import_one_model(group, cfg: NeRFConfig) -> tuple[dict, dict | None]:
    """One functional model group -> (mlp params, bn running stats)."""
    dense, bn = _collect(group)
    n = cfg.num_layers
    if len(dense) != n + 4:
        raise ValueError(
            f"expected {n} trunk + 4 head dense layers, found {len(dense)}"
        )

    xyz_dim, dir_dim, hidden = cfg.xyz_dim, cfg.dir_dim, cfg.hidden_dim
    dims = trunk_input_dims(n, hidden, cfg.skip_layer, xyz_dim)
    head_in = head_input_dim(n, hidden, cfg.skip_layer, xyz_dim)

    def dense_params(arrs, want_shape, what):
        w, b = arrs
        if w.shape != want_shape:
            raise ValueError(
                f"{what}: kernel shape {w.shape} != expected {want_shape} "
                f"— wrong config for this checkpoint?"
            )
        return {"w": w.astype(np.float32), "b": b.astype(np.float32)}

    trunk = [
        dense_params(arrs, (dims[i], hidden), f"trunk[{i}]")
        for i, arrs in enumerate(dense[:n])
    ]

    # Heads matched by their (unique) kernel shapes.
    want = {
        "sigma": (head_in, 1),
        "feature": (head_in, hidden),
        "branch": (hidden + dir_dim, hidden // 2),
        "rgb": (hidden // 2, 3),
    }
    if len(set(want.values())) != 4:
        raise ValueError(f"ambiguous head shapes for this config: {want}")
    by_shape = {v: k for k, v in want.items()}
    heads: dict[str, dict] = {}
    for arrs in dense[n:]:
        slot = by_shape.get(tuple(arrs[0].shape))
        if slot is None or slot in heads:
            raise ValueError(
                f"unmatched head kernel of shape {arrs[0].shape}; "
                f"expected one of {want}"
            )
        heads[slot] = dense_params(arrs, want[slot], slot)

    params = {"trunk": trunk, **heads}

    bn_state = None
    if bn:
        if len(bn) != n + 1:
            raise ValueError(
                f"expected {n} trunk + 1 branch BatchNorm layers, found {len(bn)}"
            )
        # vars order: gamma, beta, moving_mean, moving_var (keras build order)
        for i, arrs in enumerate(bn[:n]):
            params["trunk"][i]["gamma"] = arrs[0].astype(np.float32)
            params["trunk"][i]["beta"] = arrs[1].astype(np.float32)
        params["branch"]["gamma"] = bn[n][0].astype(np.float32)
        params["branch"]["beta"] = bn[n][1].astype(np.float32)
        bn_state = {
            "trunk": [
                {
                    "mean": arrs[2].astype(np.float32),
                    "var": arrs[3].astype(np.float32),
                }
                for arrs in bn[:n]
            ],
            "branch": {
                "mean": bn[n][2].astype(np.float32),
                "var": bn[n][3].astype(np.float32),
            },
        }
    return params, bn_state


def import_reference_weights(
    path: str, cfg: NeRFConfig
) -> tuple[dict, dict | None]:
    """Load a reference ``.weights.h5`` into ``(params, bn_state)`` pytrees.

    Returns the same structures as ``init_train_state(...).params`` /
    ``.bn``: ``{'coarse': mlp, 'fine': mlp}``.
    """
    import h5py

    with h5py.File(path, "r") as f:
        out_p, out_bn = {}, {}
        for ours, theirs in (("coarse", "coarse_model"), ("fine", "fine_model")):
            if theirs not in f:
                raise KeyError(
                    f"{path} has no '{theirs}' group; found {list(f)} — "
                    "not a reference NeRFTrainer weights file?"
                )
            out_p[ours], out_bn[ours] = _import_one_model(f[theirs], cfg)
            has_bn = out_bn[ours] is not None
            if has_bn != cfg.batch_norm:
                # Fail here with a diagnosis instead of a cryptic pytree
                # structure mismatch at device_put time.
                raise ValueError(
                    f"{path}: checkpoint "
                    f"{'has' if has_bn else 'has no'} BatchNorm layers but "
                    f"the config sets BATCH_NORM="
                    f"{'true' if cfg.batch_norm else 'false'}"
                )
    if all(v is None for v in out_bn.values()):
        return out_p, None
    return out_p, out_bn
