"""Volume rendering: alpha compositing with cumulative transmittance.

Capability parity with reference data_utils.py:75-98 (``volume_render``),
with two deliberate generalizations documented in SURVEY.md §7:

* works for any leading batch shape (the reference assumes rank-2 inputs —
  ``delta.shape[0]`` at data_utils.py:82);
* numerics are kept bit-comparable to the reference: sigmoid on rgb, relu
  on sigma, 1e10 terminal delta, and the epsilon *inside* the cumulative
  product (``cumprod(1 - alpha + 1e-10)``, data_utils.py:90).

Everything is elementwise + one cumulative product along the (small,
static) sample axis — XLA fuses the whole thing into the surrounding
computation; the Pallas fused ray-march kernel re-implements the same math
in-register for the megakernel path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-10
_TERMINAL_DELTA = 1e10


def volume_render(
    preds: jnp.ndarray, t_vals: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite raw MLP outputs into pixel rgb / depth / per-sample weights.

    Args:
        preds: ``(..., S, 4)`` raw MLP outputs; channels ``[:3]`` are rgb
            logits, ``[3]`` is density (reference data_utils.py:77-78).
        t_vals: ``(..., S)`` sample distances along each ray.

    Returns:
        ``(rgb, depth, weights)`` with shapes ``(..., 3)``, ``(...,)``,
        ``(..., S)``.
    """
    preds = preds.astype(jnp.float32)
    t_vals = t_vals.astype(jnp.float32)
    rgb = jax.nn.sigmoid(preds[..., :3])
    sigma = jnp.maximum(preds[..., 3], 0.0)

    # Interval widths; final interval open-ended (data_utils.py:81-83).
    delta = jnp.diff(t_vals, axis=-1)
    delta = jnp.concatenate(
        [delta, jnp.full_like(delta[..., :1], _TERMINAL_DELTA)], axis=-1
    )

    alpha = 1.0 - jnp.exp(-sigma * delta)

    # Exclusive cumulative transmittance, epsilon inside the product to
    # match reference numerics exactly (data_utils.py:87-92).
    trans = jnp.cumprod(1.0 - alpha + _EPS, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1
    )

    weights = alpha * trans
    rgb_out = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth = jnp.sum(weights * t_vals, axis=-1)
    return rgb_out, depth, weights


def composite_background(
    rgb: jnp.ndarray, weights: jnp.ndarray, bkgd: float = 1.0
) -> jnp.ndarray:
    """Compose a rendered ray color onto a solid background
    (vanilla NeRF's ``white_bkgd``; absent from the reference, which
    always composites onto black):

    .. math:: c' = c + (1 - \\sum_s w_s) \\cdot b

    On scenes photographed/rendered over a known background (the Blender
    sets are white) this frees the model from fitting a glowing shell or
    fog to explain background pixels — empty space can stay empty.

    Args:
        rgb: ``(..., 3)`` black-composited color.
        weights: ``(..., S)`` compositing weights for the same rays.
        bkgd: background intensity (1.0 = white).
    """
    acc = jnp.sum(weights, axis=-1, keepdims=True)
    return rgb + (1.0 - acc) * bkgd


def distortion_loss(
    t_vals: jnp.ndarray,
    weights: jnp.ndarray,
    near: float,
    far: float,
) -> jnp.ndarray:
    """Mip-NeRF 360's distortion regularizer, O(S) per ray (beyond-reference).

    .. math::
        L = \\sum_{ij} w_i w_j |m_i - m_j| + \\tfrac13 \\sum_i w_i^2 \\delta_i

    over ray-normalized sample coordinates ``s = (t - near) / (far - near)``
    — the first term pulls compositing mass into one compact cluster along
    the ray (kills floaters / background collapse), the second shrinks each
    occupied interval.  The reference has no geometry regularizer at all.

    Point-sample adaptation (our samples are t positions, not bin
    intervals): interval ``i`` spans ``[s_i, s_{i+1})`` with midpoint
    ``m_i``; the LAST sample gets a zero-width interval instead of the
    compositor's 1e10 terminal delta — an unbounded interval would make
    the loss meaningless (its self-term alone would dwarf the scene), and
    dropping it leaves the pairwise term intact.

    The quadratic double sum collapses to cumulative sums because the
    samples are sorted along the ray:
    ``sum_ij w_i w_j |m_i - m_j| = 2 sum_i w_i (m_i A_i - B_i)`` with
    ``A_i = sum_{j<i} w_j``, ``B_i = sum_{j<i} w_j m_j`` — two cumsums on
    the (small, static) sample axis, XLA-fusable, grads flow to both
    ``weights`` and ``t_vals``.  Verified against the naive O(S^2) double
    sum in tests/test_ops.py.

    Args:
        t_vals: (..., S) sorted sample positions along each ray.
        weights: (..., S) compositing weights for those samples.
    Returns:
        Scalar: the mean per-ray distortion.
    """
    s = (t_vals - near) / (far - near)
    delta = jnp.concatenate(
        [s[..., 1:] - s[..., :-1], jnp.zeros_like(s[..., :1])], axis=-1
    )
    mid = s + 0.5 * delta
    # exclusive prefix sums: A_i = sum_{j<i} w_j, B_i = sum_{j<i} w_j m_j
    cw = jnp.cumsum(weights, axis=-1)
    cwm = jnp.cumsum(weights * mid, axis=-1)
    a = cw - weights
    b = cwm - weights * mid
    pairwise = 2.0 * jnp.sum(weights * (mid * a - b), axis=-1)
    self_term = jnp.sum(jnp.square(weights) * delta, axis=-1) / 3.0
    return jnp.mean(pairwise + self_term)
