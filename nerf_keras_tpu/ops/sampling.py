"""Ray-interval sampling: stratified t-values and inverse-CDF importance.

Counterparts of reference data_utils.py:119-138 (``generate_t_vals``) and
:172-223 (``sample_pdf``), redesigned TPU-first:

* fully key-driven: randomness is explicit per step under ``jit`` — the
  reference draws its jitter once at dataset-build time (data_utils.py:156)
  and its fine-sample uniforms through TF global RNG state;
* ``sample_pdf`` is gather-free: ONE bf16 transition one-hot drives a
  single MXU einsum (``precision=HIGHEST``, load-bearing — see the
  in-function comment) against a stacked value matrix for all four
  below/above lookups — the reference's version is the only TF-locked
  code in its compute core (tf.searchsorted/tf.gather,
  data_utils.py:196-213), and a searchsorted/take_along_axis port
  measured ~27 ms/step of gather cost at the flagship batch;
* shape-polymorphic over leading batch dims (the reference special-cases
  rank-2 and rank-4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def generate_t_vals(
    key: jax.Array | None,
    near: float,
    far: float,
    batch_shape: tuple[int, ...],
    num_samples: int,
    mode: str = "stratified",
) -> jnp.ndarray:
    """Sample distances along rays in ``[near, far]``.

    Args:
        key: PRNG key; may be ``None`` for ``mode='center'``.
        near, far: scene bounds.
        batch_shape: leading shape, e.g. ``(B,)`` for a flat ray batch.
        num_samples: samples per ray S.
        mode:
            ``'stratified'`` — per-ray, per-sample jitter within each bin
                (standard NeRF stratified sampling; documented improvement
                over the reference, SURVEY.md §7);
            ``'shared'``    — one jitter vector shared by every ray in the
                batch, redrawn each call (the jit-able analogue of reference
                data_utils.py:131-137, whose vector is frozen at
                dataset-build time);
            ``'center'``    — deterministic linspace (reference
                ``rand_sampling=False``).

    Returns:
        ``(*batch_shape, S)`` float32 t-values, ascending per ray for
        'stratified'/'center' ('shared' matches the reference: a uniform
        shift of up to one bin applied to every sample).
    """
    base = jnp.linspace(near, far, num_samples, dtype=jnp.float32)
    bin_width = (far - near) / num_samples
    if mode == "center":
        return jnp.broadcast_to(base, (*batch_shape, num_samples))
    if key is None:
        raise ValueError(f"mode={mode!r} requires a PRNG key")
    if mode == "shared":
        noise = jax.random.uniform(key, (num_samples,)) * bin_width
        return jnp.broadcast_to(base + noise, (*batch_shape, num_samples))
    if mode == "stratified":
        noise = jax.random.uniform(key, (*batch_shape, num_samples)) * bin_width
        return jnp.broadcast_to(base, (*batch_shape, num_samples)) + noise
    raise ValueError(f"unknown sampling mode: {mode!r}")


def sorted_union(t_vals: jnp.ndarray, t_fine: jnp.ndarray) -> jnp.ndarray:
    """Ascending union of coarse + fine sample distances (reference
    models.py:167 ``sort(concat(...))``).

    Uses an unstable ``lax.sort``: keys are floats and downstream only
    consumes values, so the stable bitonic network ``jnp.sort`` builds is
    pure overhead on TPU.
    """
    return jax.lax.sort(
        jnp.concatenate([t_vals, t_fine], axis=-1),
        dimension=-1,
        is_stable=False,
    )


def sample_pdf(
    key: jax.Array,
    t_vals_mid: jnp.ndarray,
    weights: jnp.ndarray,
    ns_fine: int,
    deterministic: bool = False,
    stratified: bool = False,
) -> jnp.ndarray:
    """Hierarchical sampling: draw ``ns_fine`` t-values ∝ coarse weights.

    Inverse-CDF sampling over the piecewise-constant pdf defined by the
    coarse pass's compositing weights (reference data_utils.py:172-223;
    numerics preserved: +1e-5 weight floor, right-side searchsorted, index
    clamping, denominator floor at 1e-5).

    Args:
        key: PRNG key for the uniform draws.
        t_vals_mid: ``(..., S-1)`` midpoints of coarse intervals.
        weights: ``(..., S)`` coarse compositing weights.
        ns_fine: number of fine samples to draw.
        deterministic: if True, use evenly spaced u in (0, 1) instead of
            uniforms (useful for reproducible eval; not in the reference).
        stratified: if True (and not deterministic), draw one uniform per
            equal-width u-stratum — ``u_j = (j + U_j) / F`` — instead of
            iid uniforms.  The draws are then ascending per ray and cover
            the whole CDF, which matters when they form the next level's
            PARTITION in a proposal chain (Mip-NeRF 360 draws each level
            stratified): iid draws leave random gaps/clumps the next
            level inherits.  Not reference semantics — the parity path
            never sets it.

    Returns:
        ``(..., ns_fine)`` new sample distances (unsorted, as reference).
    """
    if ns_fine == 0:
        # coarse-only rendering/training: nothing to draw (and the
        # deterministic branch's 0.5 / ns_fine must not divide by zero)
        return jnp.zeros((*weights.shape[:-1], 0), jnp.float32)
    weights = weights.astype(jnp.float32) + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., S+1)

    u_shape = (*weights.shape[:-1], ns_fine)
    if deterministic:
        u = jnp.linspace(0.5 / ns_fine, 1.0 - 0.5 / ns_fine, ns_fine)
        u = jnp.broadcast_to(u, u_shape).astype(jnp.float32)
    elif stratified:
        base = jnp.arange(ns_fine, dtype=jnp.float32) / ns_fine
        u = base + jax.random.uniform(
            key, u_shape, dtype=jnp.float32
        ) / ns_fine
    else:
        u = jax.random.uniform(key, u_shape, dtype=jnp.float32)

    # searchsorted(side='right') == count of cdf entries <= u, so the
    # 'below' index is the unique k with cdf[k] <= u < cdf[k+1] (with
    # cdf[K] := +inf; plateau bins give empty half-open intervals and the
    # last plateau entry wins, exactly like searchsorted-right - 1).  That
    # makes ONE one-hot over the (static, small) cdf axis, and all four
    # lookups (cdf/t at below/above) become a single (..., F, K) x
    # (..., K, 4) matmul against a stack of value vectors — the 'above'
    # (= min(K-1, below+1)) lookups are expressed by shifting the VALUE
    # vectors rather than the one-hot, which also realizes the index clamp.
    # TPU-first rationale: take_along_axis gathers cost ~27 ms/step at the
    # flagship batch; a one-hot einsum rides the MXU, its only large
    # intermediate is the bf16 one-hot (~34 MB vs ~540 MB for four f32
    # masked-select trees), and every output is exact — each column has a
    # single nonzero, multiplying 1.0 (exact in bf16) by an f32 value.
    cdf_next = jnp.concatenate(
        [cdf[..., 1:], jnp.full_like(cdf[..., :1], jnp.inf)], axis=-1
    )
    onehot = jnp.logical_and(
        cdf[..., :, None] <= u[..., None, :],
        u[..., None, :] < cdf_next[..., :, None],
    ).astype(jnp.bfloat16)  # (..., K, F), one-hot along k

    # t-midpoint lookups clamp to the last midpoint (data_utils.py:211):
    # extend t_mid to cdf length K by repeating its final entry.
    pad = cdf.shape[-1] - t_vals_mid.shape[-1]
    t_mid_ext = jnp.concatenate(
        [t_vals_mid] + [t_vals_mid[..., -1:]] * pad, axis=-1
    )

    def shift_up(v: jnp.ndarray) -> jnp.ndarray:
        """v[min(k+1, K-1)] — the 'above' value vector."""
        return jnp.concatenate([v[..., 1:], v[..., -1:]], axis=-1)

    values = jnp.stack(
        [cdf, shift_up(cdf), t_mid_ext, shift_up(t_mid_ext)], axis=-1
    )  # (..., K, 4)
    # precision=HIGHEST is load-bearing: TPU's DEFAULT f32 matmul
    # precision truncates operands to bf16, which quantizes the selected
    # cdf/t values (~0.4% relative) — fine samples land on a ~0.016 grid
    # in t and cost ~1.3 dB of val PSNR at the flagship config (measured,
    # docs/PERF.md).  CPU tests can't catch this (f32 dots are exact
    # there); tests/test_ops.py pins exactness in principle, the TPU
    # bench in practice.  With HIGHEST the pass decomposition makes
    # 1.0 x f32 exact again at negligible cost (~0.3 GFLOP).
    sel = jnp.einsum(
        "...kf,...kv->...fv",
        onehot,
        values,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    cdf_below, cdf_above, t_below, t_above = (
        sel[..., 0], sel[..., 1], sel[..., 2], sel[..., 3]
    )

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return t_below + t * (t_above - t_below)
