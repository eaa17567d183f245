"""Coarse-to-fine frequency annealing of the positional encoding.

Beyond-reference training-quality knob (FreeNeRF, Yang et al. CVPR 2023;
the windowing schedule itself is Nerfies eq. 8): for the first
``FREQ_ANNEAL_STEPS`` optimizer steps the high positional-encoding
octaves are masked out and eased in octave by octave, so early training
fits the low-frequency scene layout before the high-frequency capacity
can memorize the training views.  This is the standard remedy for the
few-view failure mode documented in docs/PERF.md ("Multi-object scene
generalization"): train PSNR climbs while val sticks at ~11 dB — the
high octaves overfit floaters that explain the training rays only.

TPU-native design — the window is a WEIGHT FOLD, not an activation op:

    relu((x_enc * w) @ W1)  ==  relu(x_enc @ (diag(w) @ W1))

so instead of multiplying every ``(N, 63)`` encoding (a lane-padded
VPU sweep on the XLA path, and an extra operand + VJP surgery on the
Pallas megakernel), the window scales the ROWS of the few weight
matrices that consume the encoding: ``trunk[0].w`` and, via the
``[h, x_enc]`` skip concat (models/mlp.py:228, ops/pallas/fused_mlp.py
:122 — both paths append the encoding LAST), the trailing ``xyz_dim``
rows of every skip-consuming matrix.  One ``(63, 256)`` elementwise
multiply per net per step, traced inside the jitted step, and the
battle-tested kernels are untouched on every path (bf16 Pallas, XLA,
int8 — the quantizer bakes folded weights).

Gradient semantics come for free: the fold happens inside the
differentiated loss, so ``dW1 = w * dW1_eff`` — rows of masked octaves
receive exactly zero gradient and stay at their init until the window
opens (Adam's moments stay zero too).  Eval/render during training MUST
apply the same window (the masked rows hold random init values that
would otherwise inject noise); every consumer therefore folds with the
state's CURRENT step, and after the horizon the window is all-ones so
completed checkpoints behave identically to an un-annealed run.
"""

from __future__ import annotations

import jax.numpy as jnp


def freq_window(
    num_freqs: int,
    alpha: jnp.ndarray | float,
    d: int = 3,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Per-feature window for one encoded input, matching the
    ``encode_position`` layout ``[x, sin_0, cos_0, ..., sin_{L-1},
    cos_{L-1}]`` (blocks of width ``d``).

    The identity block is always 1.  Octave ``j`` carries the Nerfies
    eq. 8 ease ``0.5 * (1 - cos(pi * clip(alpha*L - j, 0, 1)))``:
    at ``alpha = 0`` only the raw coordinates pass, octaves open one by
    one, and ``alpha >= 1`` is the identity window.

    Args:
        num_freqs: octave count L of the encoding.
        alpha: anneal progress in [0, 1] (python float or traced scalar).

    Returns:
        ``(d + 2*d*L,)`` float window.
    """
    ident = jnp.ones((d,), dtype)
    if num_freqs == 0:
        return ident
    j = jnp.arange(num_freqs, dtype=dtype)
    band = jnp.clip(jnp.asarray(alpha, dtype) * num_freqs - j, 0.0, 1.0)
    w = 0.5 * (1.0 - jnp.cos(jnp.pi * band))  # (L,)
    # Each octave contributes a sin block then a cos block, width d each.
    return jnp.concatenate([ident, jnp.repeat(w, 2 * d)])


def _scale_rows(layer: dict, row_scale: jnp.ndarray) -> dict:
    """New layer dict with ``w``'s rows scaled (b/gamma/beta untouched)."""
    w = layer["w"]
    return {**layer, "w": w * row_scale[:, None].astype(w.dtype)}


def fold_nerf_params(params: dict, w_xyz: jnp.ndarray) -> dict:
    """Fold the position window into one NeRF MLP's parameter tree.

    Shape-driven: scales all rows of ``trunk[0].w`` (pure-encoding
    input) and the trailing ``xyz_dim`` rows of any trunk layer or
    sigma/feature/head matrix whose input is the ``hidden + xyz_dim``
    skip concat (``[h, x_enc]`` order — models/mlp.py:228).  Handles the
    full two-head tree, the BN variant (stats/scales untouched; config
    validation rejects the combination anyway) and the legacy
    single-head tree.  View-direction encodings are not annealed
    (FreeNeRF's gains come from the position side; the direction branch
    only shades).
    """
    nx = w_xyz.shape[0]
    trunk = params["trunk"]
    hidden = trunk[0]["w"].shape[1]
    skip_scale = jnp.concatenate([jnp.ones((hidden,), w_xyz.dtype), w_xyz])

    def fold_layer(i: int, layer: dict) -> dict:
        if i == 0:
            return _scale_rows(layer, w_xyz)
        if layer["w"].shape[0] == hidden + nx:
            return _scale_rows(layer, skip_scale)
        return layer

    out = dict(params)
    out["trunk"] = [fold_layer(i, l) for i, l in enumerate(trunk)]
    for head in ("sigma", "feature", "head"):
        if head in params and params[head]["w"].shape[0] == hidden + nx:
            out[head] = _scale_rows(params[head], skip_scale)
    return out


def fold_proposal_params(params: dict, w_xyz: jnp.ndarray) -> dict:
    """Fold the window into the proposal net (first layer consumes the
    encoding directly; no skip concat — ops/proposal.py:init_proposal).
    Chain trees (``{'l1': ..., 'l2': ...}``, PROP_LEVELS=2) fold every
    level — each net consumes the same PROP_L_XYZ encoding."""
    if "layers" not in params:
        return {k: fold_proposal_params(v, w_xyz) for k, v in params.items()}
    layers = params["layers"]
    return {
        **params,
        "layers": [_scale_rows(layers[0], w_xyz)] + list(layers[1:]),
    }


def anneal_alpha(step, horizon: int) -> jnp.ndarray:
    """Progress in [0, 1] at optimizer ``step`` for a ``horizon``-step
    anneal.  Traced-safe (``step`` may be the device scalar in
    ``TrainState.step``)."""
    return jnp.clip(
        jnp.asarray(step, jnp.float32) / float(horizon), 0.0, 1.0
    )


def fold_train_params(cfg, params: dict, step) -> dict:
    """Fold the current window into a full train-state params dict
    (``{'coarse','fine'}`` or ``{'proposal','fine'}``), each net with
    its own octave count.  Identity when ``cfg.freq_anneal_steps`` is 0;
    callers gate on that to skip the (tiny) fold ops entirely.
    """
    horizon = cfg.freq_anneal_steps
    if horizon <= 0:
        return params
    alpha = anneal_alpha(step, horizon)
    w_xyz = freq_window(cfg.l_xyz, alpha)
    out = {}
    for name, sub in params.items():
        if name == "proposal":
            out[name] = fold_proposal_params(
                sub, freq_window(cfg.prop_l_xyz, alpha)
            )
        else:
            out[name] = fold_nerf_params(sub, w_xyz)
    return out
