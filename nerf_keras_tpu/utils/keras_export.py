"""Exporter to the reference's Keras ``.weights.h5`` checkpoint format.

The inverse of :mod:`nerf_keras_tpu.utils.keras_import`: writes our params
pytree as a file the reference loads verbatim with
``NeRFTrainer.load_weights(path)`` (reference inference.py:158-170), so a
model trained in this framework can be served by the reference's own
inference/visualization tooling — interop in both directions.

Keras 3 lays ``save_weights`` output out as (verified against keras 3.13,
see keras_import's module docstring and tests/fixtures/)::

    /<attribute name>/layers/<class_slug[_i]>/vars/{0: kernel, 1: bias}

where ``<class_slug[_i]>`` is the snake-cased layer class name with a
per-file dedup counter assigned in MODEL-WALK order (graph depth order —
NOT creation order; the layer's creation-order ``name`` is stored as an
attr on ``vars`` but is ignored by ``load_weights``, which regenerates
the walk paths from its own structure).  For the reference architecture
(reference models.py:24-62) the walk visits, per model:

- ``input_layer``, ``input_layer_1`` (no vars),
- the trunk Dense layers input-to-output (``dense`` .. ``dense_{n-1}``),
- the heads BY DEPTH: feature, branch, rgb, sigma
  (``dense_n`` .. ``dense_{n+3}``),
- the Concatenate layers (skip concats, then dirs, then rgb|sigma output;
  no vars),
- with ``BATCH_NORM``: BatchNormalization trunk 0..n-1 then branch
  (vars order gamma, beta, moving_mean, moving_var) and the matching
  ReLU layers (no vars).

Layer-group completeness matters: keras walks ITS model and looks each
layer's group up by the regenerated path, so the var-less groups must
exist too.  A live-keras ``load_weights`` + forward-parity test pins this
contract (tests/test_keras_import.py).
"""

from __future__ import annotations

import numpy as np

from nerf_keras_tpu.config import NeRFConfig


def _np(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


class _Walk:
    """Keras-style per-class-slug dedup naming in walk order."""

    def __init__(self, layers_group):
        self.g = layers_group
        self.counts: dict[str, int] = {}

    def add(self, slug: str, name: str, arrays: list[np.ndarray]) -> None:
        i = self.counts.get(slug, 0)
        self.counts[slug] = i + 1
        group = self.g.create_group(slug if i == 0 else f"{slug}_{i}")
        vars_g = group.create_group("vars")
        vars_g.attrs["name"] = name
        for j, a in enumerate(arrays):
            vars_g.create_dataset(str(j), data=_np(a))


class _Namer:
    """Creation-order layer names (the ``name`` attr keras records).

    Purely informational — keras ignores it on load — but written so the
    file is byte-layout-faithful to a fresh-process reference save.
    """

    def __init__(self):
        self.counts: dict[str, int] = {}

    def __call__(self, slug: str) -> str:
        i = self.counts.get(slug, 0)
        self.counts[slug] = i + 1
        return slug if i == 0 else f"{slug}_{i}"


def _export_one_model(
    f,
    group_name: str,
    params: dict,
    bn_state: dict | None,
    namer: _Namer,
    skip_layer: int,
) -> None:
    model_g = f.create_group(group_name)
    model_g.create_group("vars").attrs["name"] = namer("functional")
    walk = _Walk(model_g.create_group("layers"))

    trunk = params["trunk"]
    n = len(trunk)
    use_bn = "gamma" in trunk[0]
    if use_bn and bn_state is None:
        raise ValueError(
            f"{group_name}: params carry BatchNorm gamma/beta but no "
            "running stats were given — pass the trainer's bn state"
        )

    # Creation-order names first (reference graph-build order,
    # models.py:24-62): inputs, trunk (+BN/ReLU), sigma, feature, dirs
    # concat, branch (+BN/ReLU), rgb, output concat.
    names = {"inputs": [namer("input_layer"), namer("input_layer")]}
    trunk_names = []
    for i in range(n):
        entry = {"dense": namer("dense")}
        if use_bn:
            entry["bn"] = namer("batch_normalization")
            entry["relu"] = namer("re_lu")
        if i % skip_layer == 0 and i > 0:
            entry["concat"] = namer("concatenate")
        trunk_names.append(entry)
    names["sigma"] = namer("dense")
    names["feature"] = namer("dense")
    names["dirs_concat"] = namer("concatenate")
    names["branch"] = namer("dense")
    if use_bn:
        names["branch_bn"] = namer("batch_normalization")
        names["branch_relu"] = namer("re_lu")
    names["rgb"] = namer("dense")
    names["out_concat"] = namer("concatenate")

    # Walk order (graph depth) — what load_weights actually matches on.
    for nm in names["inputs"]:
        walk.add("input_layer", nm, [])
    for i in range(n):
        walk.add("dense", trunk_names[i]["dense"],
                 [params["trunk"][i]["w"], params["trunk"][i]["b"]])
    for head in ("feature", "branch", "rgb", "sigma"):
        walk.add("dense", names[head],
                 [params[head]["w"], params[head]["b"]])
    for entry in trunk_names:
        if "concat" in entry:
            walk.add("concatenate", entry["concat"], [])
    walk.add("concatenate", names["dirs_concat"], [])
    walk.add("concatenate", names["out_concat"], [])
    if use_bn:
        for i in range(n):
            walk.add(
                "batch_normalization", trunk_names[i]["bn"],
                [params["trunk"][i]["gamma"], params["trunk"][i]["beta"],
                 bn_state["trunk"][i]["mean"], bn_state["trunk"][i]["var"]],
            )
        walk.add(
            "batch_normalization", names["branch_bn"],
            [params["branch"]["gamma"], params["branch"]["beta"],
             bn_state["branch"]["mean"], bn_state["branch"]["var"]],
        )
        for entry in trunk_names:
            walk.add("re_lu", entry["relu"], [])
        walk.add("re_lu", names["branch_relu"], [])


def export_reference_weights(
    path: str,
    params: dict,
    cfg: NeRFConfig,
    bn_state: dict | None = None,
) -> None:
    """Write ``{'coarse','fine'}`` params as a reference ``.weights.h5``.

    Args:
        path: output path (local; ``.weights.h5`` by reference convention).
        params: ``{'coarse': mlp, 'fine': mlp}`` pytree — the layout of
            :func:`nerf_keras_tpu.models.mlp.init_nerf_params` /
            ``TrainState.params`` (EMA callers should pass the shadow).
        cfg: the run config (``skip_layer`` shapes the graph walk).
        bn_state: running stats pytree when ``cfg.batch_norm`` —
            ``TrainState.bn``.

    Raises:
        ValueError: for proposal-trained states (``{'proposal','fine'}``) —
            the reference format has coarse+fine slots only and its
            renderer needs the coarse model to place fine samples.
    """
    import h5py

    missing = {"coarse", "fine"} - set(params)
    if missing:
        raise ValueError(
            f"cannot export to the reference format: params have no "
            f"{sorted(missing)} model (found {sorted(params)}). "
            "TRAIN_SAMPLER='proposal' checkpoints carry a tiny proposal "
            "net instead of the coarse MLP the reference renderer "
            "requires — retrain with the parity coarse+fine step to "
            "export."
        )

    namer = _Namer()
    with h5py.File(path, "w") as f:
        f.create_group("vars").attrs["name"] = "ne_rf_trainer"
        for ours, theirs in (("coarse", "coarse_model"),
                             ("fine", "fine_model")):
            _export_one_model(
                f, theirs, params[ours],
                None if bn_state is None else bn_state.get(ours),
                namer, cfg.skip_layer,
            )
