"""Sinusoidal (Fourier-feature) positional encoding.

Capability parity with reference data_utils.py:7-21 (``encode_position``):
output feature layout is ``[x, sin(2^0 x), cos(2^0 x), ..., sin(2^{L-1} x),
cos(2^{L-1} x)]`` concatenated on the last axis, so width = D + 2*D*L
(63 for D=3, L=10; 27 for D=3, L=4).

TPU-native implementation: one broadcasted multiply against a precomputed
frequency vector plus a single sin and cos over the full ``(..., L, D)``
block — two transcendental sweeps on the VPU instead of the reference's 2*L
separate op calls, and trivially fusible by XLA into whatever consumes it.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def encode_position(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """Fourier-encode coordinates.

    Args:
        x: ``(..., D)`` coordinates.
        num_freqs: number of octaves L (reference ``pos_encode_dims``).

    Returns:
        ``(..., D + 2*D*L)`` features, ordered exactly as the reference
        (identity block first, then per-octave sin, cos blocks of width D).
    """
    if num_freqs == 0:
        return x
    d = x.shape[-1]
    freqs = jnp.asarray(2.0 ** np.arange(num_freqs), dtype=x.dtype)  # (L,)
    # (..., 1, D) * (L, 1) -> (..., L, D)
    scaled = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    # interleave per-octave: (..., L, 2, D) -> (..., 2*L*D) gives
    # [sin_0, cos_0, sin_1, cos_1, ...] blocks of width D — reference order.
    sincos = jnp.stack([sin, cos], axis=-2)
    sincos = sincos.reshape(*x.shape[:-1], 2 * num_freqs * d)
    return jnp.concatenate([x, sincos], axis=-1)


def encoded_width(d: int, num_freqs: int) -> int:
    """Output feature width for ``d``-dim input and L octaves."""
    return d + 2 * d * num_freqs
