"""Image-quality metrics on rendered frames (beyond-reference).

The reference reports PSNR only (models.py:84-86 tracks loss/psnr).  SSIM
is the other standard NeRF table metric; this is the classic Wang et al.
2004 formulation with the exact constants and Gaussian window
``tf.image.ssim`` uses (filter_size=11, filter_sigma=1.5, k1=0.01,
k2=0.03, VALID padding, biased moment estimates), so numbers are
comparable to published results.  Pure JAX and jittable; parity vs a
committed ``tf.image.ssim`` golden fixture is pinned in
tests/test_image_metrics.py (regenerate with
scripts/make_ssim_fixture.py — tensorflow is importable in this image).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * jnp.square(x / sigma))
    return g / jnp.sum(g)


def _filter2d(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian filter, VALID padding.

    x: (B, H, W, C) -> (B, H-size+1, W-size+1, C).  Two rank-1 sweeps
    instead of one 11x11 kernel: same result (the window is an outer
    product), ~5x fewer MACs.
    """
    c = x.shape[-1]
    dn = lax.conv_dimension_numbers(x.shape, (1, 1, 1, c), ("NHWC", "HWIO", "NHWC"))
    kh = jnp.tile(win[:, None, None, None], (1, 1, 1, c))
    kw = jnp.tile(win[None, :, None, None], (1, 1, 1, c))
    x = lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    max_val: float = 1.0,
    *,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM between image pairs.

    Args:
        a, b: ``(H, W, C)`` or ``(B, H, W, C)`` images in ``[0, max_val]``.
    Returns:
        Scalar for a single pair, ``(B,)`` for a batch: SSIM averaged over
        the VALID-cropped spatial map and channels (``tf.image.ssim``
        semantics).
    """
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    if a.ndim not in (3, 4):
        raise ValueError(f"expected (H,W,C) or (B,H,W,C), got {a.shape}")
    if min(a.shape[-3], a.shape[-2]) < filter_size:
        raise ValueError(
            f"images {a.shape} smaller than the {filter_size}x"
            f"{filter_size} SSIM window"
        )
    single = a.ndim == 3
    if single:
        a, b = a[None], b[None]
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)

    win = _gaussian_kernel(filter_size, filter_sigma)
    mu_a = _filter2d(a, win)
    mu_b = _filter2d(b, win)
    # Biased (non-Bessel) local moments, exactly as tf.image.ssim.
    var_a = _filter2d(a * a, win) - mu_a * mu_a
    var_b = _filter2d(b * b, win) - mu_b * mu_b
    cov = _filter2d(a * b, win) - mu_a * mu_b

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    luminance = (2.0 * mu_a * mu_b + c1) / (mu_a * mu_a + mu_b * mu_b + c1)
    cs = (2.0 * cov + c2) / (var_a + var_b + c2)
    out = jnp.mean(luminance * cs, axis=(1, 2, 3))
    return out[0] if single else out


def frame_psnr(ref, test, max_val: float = 1.0) -> float:
    """PSNR between two rendered frames as a host float (numpy path —
    frames have already been fetched; no reason to re-trace a jit).
    Identical frames return ``inf``; any NaN propagates (callers treat a
    NaN comparison as a failed gate)."""
    import numpy as np

    ref = np.asarray(ref, np.float32)
    test = np.asarray(test, np.float32)
    mse = float(np.mean((ref - test) ** 2))
    if mse == 0.0:
        return float("inf")
    return float(20.0 * np.log10(max_val) - 10.0 * np.log10(mse))


def accuracy_gate(
    ref, test, gate_db: float, label: str, fallback: str
) -> tuple[bool, float]:
    """Shared accept/fall-back gate for accelerated render paths (int8,
    proposal sampler) — render the SAME frame both ways and require
    ``PSNR(test vs ref) >= gate_db``, a silent-degradation guard the
    float/coarse path never needs.  One implementation so gate semantics
    (inf on identical, NaN fails, message format) cannot drift across
    the CLI and the render server.  Returns ``(passed, psnr_db)``."""
    value = frame_psnr(ref, test)
    if value >= gate_db:  # NaN compares False -> FAIL
        print(f"[nerf-tpu] {label} gate PASS: {value:.1f} dB "
              f"(gate {gate_db:.1f})")
        return True, value
    print(f"[nerf-tpu] {label} gate FAIL: {value:.1f} dB < {gate_db:.1f}; "
          f"{fallback}")
    return False, value
