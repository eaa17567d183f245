"""Persist weight-derived inference artifacts next to a checkpoint.

The int8 calibration tables (ops/quant.py) and the distilled proposal
net (ops/proposal.py) are pure functions of the trained weights plus a
few config fields — yet rebuilding them costs a server ~20 s of
distillation + calibration per start.  This module stores both in ONE
``.infer.npz``, keyed by a sha256 digest of the exact weights (and the
config fields the derivations read), so a restart reuses them and
artifacts derived from DIFFERENT weights can never be installed — the
same staleness contract ``Trainer._invalidate_derived`` enforces
in-process, extended across processes.

The reference has no analogue: its inference rebuilds everything from
the ``.h5`` weights on every run (reference inference.py:180-268), and
it has no derived artifacts to cache in the first place.

Format: flattened pytrees keyed by ``jax.tree_util.keystr`` paths with a
``p:``/``q:`` namespace prefix (same flattening as utils/checkpoint.py),
plus ``__digest__`` / ``__prop_l_xyz__`` / ``__distill_loss__`` scalars.
Writes go through the storage abstraction, so local and ``gs://`` paths
both work.
"""

from __future__ import annotations

import hashlib
import io as _io
import json
import re

import jax
import numpy as np

from nerf_keras_tpu.utils import io
from nerf_keras_tpu.utils.checkpoint import _write_atomic

_KEY_TOKEN = re.compile(r"\['([^']+)'\]|\[(\d+)\]")


class StaleArtifactsError(RuntimeError):
    """The artifact file was derived from different weights/config."""


def params_digest(params, extra: dict | None = None) -> str:
    """sha256 over every leaf's path, dtype, shape and bytes.

    ``extra`` folds in the config fields the derived artifacts depend on
    (skip_layer, encoding sizes, compute dtype) — two trainers with
    byte-identical weights but different wiring must not share artifacts.
    """
    h = hashlib.sha256()
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        arr = np.asarray(jax.device_get(leaf))
        h.update(jax.tree_util.keystr(path).encode())
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    if extra:
        h.update(json.dumps(extra, sort_keys=True).encode())
    return h.hexdigest()


def _flatten(tree, prefix: str) -> dict[str, np.ndarray]:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[prefix + jax.tree_util.keystr(path)] = np.asarray(
            jax.device_get(leaf)
        )
    return out


def _unflatten(flat: dict[str, np.ndarray]):
    """Rebuild nested dicts/lists from keystr paths.

    Integer tokens become list indices, string tokens dict keys; a level
    mixing the two (which keystr cannot produce from a real pytree) is an
    error.  Lists must be dense 0..n-1 — a gap means a corrupt file.
    """
    root: dict = {}
    for key, arr in flat.items():
        toks = [
            m.group(1) if m.group(1) is not None else int(m.group(2))
            for m in _KEY_TOKEN.finditer(key)
        ]
        if not toks:
            raise ValueError(f"unparseable artifact key: {key!r}")
        node = root
        for t in toks[:-1]:
            node = node.setdefault(t, {})
        node[toks[-1]] = arr

    def finalize(node):
        if not isinstance(node, dict):
            return node
        out = {k: finalize(v) for k, v in node.items()}
        kinds = {isinstance(k, int) for k in out}
        if kinds == {True}:
            idx = sorted(out)
            if idx != list(range(len(idx))):
                raise ValueError(f"non-dense list indices: {idx}")
            return [out[i] for i in idx]
        if True in kinds:
            raise ValueError(f"mixed list/dict level: {sorted(map(str, out))}")
        return out

    return finalize(root)


def save_artifacts(
    path: str,
    digest: str,
    *,
    pparams=None,
    prop_l_xyz: int | None = None,
    distill_loss: float | None = None,
    qparams=None,
) -> None:
    """Write proposal and/or int8 artifacts (at least one required)."""
    if pparams is None and qparams is None:
        raise ValueError("nothing to save: no proposal net, no int8 params")
    arrays: dict[str, np.ndarray] = {"__digest__": np.array(digest)}
    if pparams is not None:
        if prop_l_xyz is None:
            raise ValueError("prop_l_xyz is required with pparams")
        arrays.update(_flatten(pparams, "p:"))
        arrays["__prop_l_xyz__"] = np.array(prop_l_xyz, np.int32)
        if distill_loss is not None:
            arrays["__distill_loss__"] = np.array(distill_loss, np.float32)
    if qparams is not None:
        arrays.update(_flatten(qparams, "q:"))
    buf = _io.BytesIO()
    np.savez(buf, **arrays)
    _write_atomic(path, buf.getvalue())


def load_artifacts(path: str, expect_digest: str) -> dict:
    """Load and digest-check; raises :class:`StaleArtifactsError` if the
    file was derived from different weights/config.

    Returns ``{"pparams", "prop_l_xyz", "distill_loss"}`` and/or
    ``{"qparams"}`` depending on what the file holds.
    """
    with io.open_file(path, "rb") as f:
        data = np.load(_io.BytesIO(f.read()), allow_pickle=False)
    stored = data["__digest__"].item()
    if stored != expect_digest:
        raise StaleArtifactsError(
            f"{path} was derived from different weights/config "
            f"(stored {stored[:12]}…, current {expect_digest[:12]}…); "
            "re-run quantize_for_inference / build_proposal_sampler"
        )
    out: dict = {}
    p_flat = {k[2:]: data[k] for k in data.files if k.startswith("p:")}
    q_flat = {k[2:]: data[k] for k in data.files if k.startswith("q:")}
    if p_flat:
        out["pparams"] = _unflatten(p_flat)
        out["prop_l_xyz"] = int(data["__prop_l_xyz__"])
        if "__distill_loss__" in data.files:
            out["distill_loss"] = float(data["__distill_loss__"])
    if q_flat:
        out["qparams"] = _unflatten(q_flat)
    return out
