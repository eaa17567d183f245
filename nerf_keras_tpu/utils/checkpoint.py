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
import os
import re

import jax
import numpy as np

from nerf_keras_tpu.config import NeRFConfig, to_reference_json, config_from_dict
from nerf_keras_tpu.utils import io


def _write_atomic(path: str, data: bytes) -> None:
    """Write so a crash mid-write can never destroy an existing file.

    Training saves every eval to the SAME path (checkpoint_name depends
    only on the config), so a plain truncating open would leave a
    corrupt file AND have already destroyed the previous good checkpoint
    if the process dies mid-write (preemption grace expiring, OOM) —
    defeating resume entirely.  Local: temp file + atomic os.replace.
    Remote object stores (gs://): objects only become visible on
    complete commit, so a direct write is already non-destructive.
    """
    if "://" in path:
        with io.open_file(path, "wb") as f:
            f.write(data)
        return
    tmp = path + ".tmp"
    with io.open_file(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


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
    # Sidecar first, npz last (both atomic): a kill in between leaves the
    # OLD npz paired with a same-run sidecar (fine), never a NEW npz with
    # a stale sidecar's scene geometry.
    if cfg is not None:
        sidecar = to_reference_json(cfg)
        if scene is not None:
            sidecar["SCENE"] = {
                k.upper(): (bool(v) if isinstance(v, (bool, np.bool_))
                            else float(v))
                for k, v in scene.items()
            }
        _write_atomic(path + ".config.json",
                      json.dumps(sidecar, indent=2).encode())
    _write_atomic(path, buf.getvalue())


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
            # Forward-compat: enabling EMA_DECAY on a resume of a pre-EMA
            # checkpoint — seed the shadow from the stored params (the
            # same initialization a fresh EMA run uses).
            if key.startswith(".ema") and ".params" + key[4:] in data:
                key = ".params" + key[4:]
            else:
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


def resolve_infer_config(cfg: NeRFConfig, path: str | None) -> tuple[NeRFConfig, list[str]]:
    """Reconcile a user config with a checkpoint's sidecar for INFERENCE.

    Four classes of sidecar field are load-bearing at render time and win
    over the passed config (returned notes say when they did):

    * ``train_sampler`` + proposal-net arch (+ ``prop_union``): they fix
      the checkpoint's STATE TREE ({'proposal','fine'} vs
      {'coarse','fine'}) — restoring across a mismatch dies on an opaque
      template error;
    * ``ema_decay``: decides WHICH weights serve — an EMA-trained
      checkpoint restored without the shadow in the template would
      silently render the raw online params;
    * ``ndc`` and ``white_bkgd``: the RAY SPACE and background
      compositing the weights were trained in.  A mismatch raises no
      error — an NDC checkpoint rendered with world-space rays (or a
      white-background model composited onto black) just produces wrong
      frames silently — so the sidecar wins;
    * ``freq_anneal_steps``: the encode-octave window the weights were
      trained under (identity for completed runs, load-bearing for
      mid-anneal checkpoints — see ops/freq_anneal.py);
    * the LR schedule is NEUTRALIZED (``lr_final=None``): the optimizer is
      never stepped at inference, a scheduled one can't even build with an
      unresolved auto horizon, and a constant-LR template restores from
      scheduled checkpoints unchanged (the extra schedule-count leaf in
      the file is ignored);
    * the sampling anneal is NEUTRALIZED (``prop_anneal_steps=0``) for the
      same reason: it shapes the TRAINING draw only (never eval/render),
      the auto horizon (-1) the training CLI resolves can't build a train
      step directly (``make_train_step`` raises), and a coarse-checkpoint
      sidecar adoption would fail ``validate()`` with it set.

    Shared by ``cli/infer.py``, ``cli/evaluate.py`` and the render server.
    """
    import dataclasses

    notes: list[str] = []
    if cfg.prop_anneal_steps != 0:
        cfg = dataclasses.replace(cfg, prop_anneal_steps=0)
    if path is not None and io.exists(path + ".config.json"):
        side = load_checkpoint_config(path)
        arch = ("train_sampler", "prop_l_xyz", "prop_hidden", "prop_depth",
                "prop_union", "prop_levels", "prop_samples")
        if any(getattr(side, f) != getattr(cfg, f) for f in arch):
            cfg = dataclasses.replace(
                cfg, **{f: getattr(side, f) for f in arch}
            ).validate()
            notes.append(
                f"checkpoint sidecar sets train_sampler={cfg.train_sampler} "
                "(overrides the config)"
            )
        if side.ema_decay != cfg.ema_decay:
            cfg = dataclasses.replace(cfg, ema_decay=side.ema_decay)
            if cfg.ema_decay > 0:
                notes.append(
                    f"checkpoint sidecar sets ema_decay={cfg.ema_decay}: "
                    "rendering the EMA weights"
                )
        # ndc: the SCENE record wins when present (it lives with the
        # near/far bounds it reparameterizes; cli/train.py writes it on
        # every save), falling back to the config field.
        scene = load_checkpoint_scene(path) or {}
        trained = {
            "ndc": bool(scene["ndc"]) if "ndc" in scene else side.ndc,
            "white_bkgd": side.white_bkgd,
            # Same silent-wrongness class: a mid-anneal checkpoint's
            # masked octave rows hold random init values; rendering it
            # without the training-time window (ops/freq_anneal.py)
            # injects their noise.  The training CLI writes the RESOLVED
            # horizon, and for completed runs the window is identity, so
            # adopting it never changes a finished checkpoint's output.
            "freq_anneal_steps": side.freq_anneal_steps,
        }
        for field, value in trained.items():
            if value != getattr(cfg, field):
                cfg = dataclasses.replace(cfg, **{field: value})
                notes.append(
                    f"checkpoint sidecar sets {field}={value} (overrides "
                    "the config — fixed at training time)"
                )
    if cfg.lr_final is not None:
        cfg = dataclasses.replace(cfg, lr_final=None, lr_decay_steps=0)
    if cfg.freq_anneal_steps == -1:
        # Unresolved auto horizon (a direct-caller sidecar): the true
        # horizon is unknowable here, and every restored checkpoint has
        # step >= 1, so a 1-step horizon gives the identity window —
        # the completed-run semantics.
        cfg = dataclasses.replace(cfg, freq_anneal_steps=1)
    return cfg, notes


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
    return {
        k.lower(): (v if isinstance(v, bool) else float(v))
        for k, v in scene.items()
    }


def _numeric_sort_key(name: str) -> tuple:
    """Natural sort: digit runs compare numerically, so ``ep10`` beats
    ``ep2`` (plain lexicographic sort returned the 2-epoch checkpoint as
    'newest' — '2' > '1')."""
    return tuple(
        int(part) if part.isdigit() else part
        for part in re.split(r"(\d+)", name)
    )


def latest_checkpoint(run_dir: str) -> str | None:
    """Newest ``*.ckpt.npz`` in a run directory (natural name order, so
    the highest-epoch file wins), or None.  ``best.*`` retention copies
    are excluded — they snapshot a PAST eval, not the latest state (use
    :func:`best_checkpoint` / :func:`resolve_checkpoint`)."""
    if not io.exists(run_dir):
        return None
    names = [
        n for n in io.listdir(run_dir)
        if n.endswith(".ckpt.npz") and not n.startswith("best.")
    ]
    if not names:
        return None
    return io.join(run_dir, sorted(names, key=_numeric_sort_key)[-1])


def best_checkpoint(run_dir: str) -> str | None:
    """The best-val retention checkpoint (``best.*.ckpt.npz``, written by
    the training loop whenever an eval improves val PSNR), or None."""
    if not io.exists(run_dir):
        return None
    names = [
        n for n in io.listdir(run_dir)
        if n.startswith("best.") and n.endswith(".ckpt.npz")
    ]
    if not names:
        return None
    return io.join(run_dir, sorted(names, key=_numeric_sort_key)[-1])


def resolve_checkpoint(run_dir: str) -> str | None:
    """Checkpoint to SERVE from a run directory: the best-val retention
    copy when present, else the latest.

    Motivation (round-3 evidence, docs/evidence/long_horizon_quality.json
    + anneal_quality_matrix.json): three documented late-decay failure
    modes overwrite a run's peak weights with collapsed ones when only
    the latest checkpoint is kept; the reference saves every epoch
    (train_lego.py:213) and so never loses its peak.  Inference, eval,
    serving and export all resolve through this."""
    return best_checkpoint(run_dir) or latest_checkpoint(run_dir)
