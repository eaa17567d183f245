"""Fused inverse-CDF importance sampling + sorted union (MEASURED LOSS).

Status: implemented, exact, fully tested — and NOT wired into the engine,
because it measured SLOWER than the XLA chain it was designed to replace:
5.65 ms vs 4.66 ms at the 16384-ray flagship chunk on v5e (round 3,
scripts/exp_render_r3.py).  This module is kept as the documented negative
result for the round-2 review's "in-kernel pdf+union (~4.6 ms/chunk
saved)" hypothesis, and as a working reference for the two structural
tricks that DO hold:

* sorted u makes the inverse CDF ascending, so the coarse/fine t-union
  is a 2-way sorted MERGE computable with rank-position compares (no
  sort primitive exists in Mosaic): ``pos_c[i] = i + #{t_f < t_c[i]}``,
  ``pos_f[j] = j + #{t_c <= t_f[j]}`` (strict/non-strict keeps tie
  positions distinct).  This covers TRAINING too — sorting the iid
  uniforms per ray preserves the fine-sample multiset and only the
  sorted union is consumed downstream;
* bin selection can loop over the static cdf axis with (R, NF) compares
  instead of materializing a (B, K, NF) one-hot in HBM.

Why it loses anyway: every loop (K=S+1 bin windows, S+NF rank counts,
S+NF scatter steps) is a serial chain of (R, <=S+NF) VPU ops — O((S+NF)^2)
VPU work per ray — while ops/sampling.py's one-hot formulation spends the
same asymptotic FLOPs on the MXU in bf16 (~8x the per-cycle throughput)
and XLA overlaps the HBM traffic.  Lesson recorded in docs/PERF.md: a
Pallas kernel only beats XLA here when it either removes lane-padded HBM
round-trips or moves work ONTO the MXU; this kernel does neither.

Numerics match ops/sampling.py exactly: +1e-5 weight floor, cdf prepend 0,
``cdf[k] <= u < cdf[k+1]`` bin windows with +inf terminal, shift-up value
clamping, 1e-5 denominator floor, t-midpoint lookups clamped to the last
midpoint.  Parity pinned in tests/test_experimental_pdf_union.py against the jnp chain
(eval grid AND sorted-random-u train variant, plateau/degenerate rows,
ray padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_keras_tpu.ops.pallas.fused_mlp import _should_interpret
from nerf_keras_tpu.ops.pallas.fused_render import _cumsum_lanes

# Rays per grid step: pdf+union is pure VPU work on (R, <=S+NF) tiles, so
# large ray tiles amortize the static bin/merge loops' issue overhead.
_TILE_RAYS = 256


def _pdf_union_kernel(s, nf, has_u, t_ref, w_ref, *refs):
    r = t_ref.shape[0]
    f32 = jnp.float32
    if has_u:
        u_ref, out_ref = refs
    else:
        (out_ref,) = refs
    t_c = t_ref[:]                       # (R, S) ascending
    w = w_ref[:].astype(f32) + 1e-5      # (R, S)

    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf_inc = _cumsum_lanes(pdf, s)      # inclusive cumsum (R, S)
    cdf = jnp.concatenate(
        [jnp.zeros((r, 1), f32), cdf_inc], axis=-1
    )  # (R, S+1)

    t_mid = 0.5 * (t_c[:, 1:] + t_c[:, :-1])            # (R, S-1)
    last = t_mid[:, -1:]
    t_mid_ext = jnp.concatenate([t_mid, last, last], axis=-1)  # (R, S+1)

    def iota_row(width):
        # tpu.iota only produces integers — cast to f32 after (compiled
        # Mosaic rejects a float iota; interpret mode does not).
        return jax.lax.broadcasted_iota(
            jnp.int32, (1, width), 1
        ).astype(f32)

    if has_u:
        # Training: caller-supplied PER-RAY u, pre-SORTED along the fine
        # axis (sorting iid uniforms preserves the sample multiset, and
        # only the sorted union is ever consumed downstream) — sortedness
        # is what keeps the rank-position merge below valid.
        u = u_ref[:].astype(f32)         # (R, NF)
    else:
        # Deterministic eval u-grid, one broadcast row (sample_pdf's
        # linspace(0.5/NF, 1-0.5/NF, NF) == (j + 0.5)/NF exactly).
        u = (iota_row(nf) + 0.5) / nf

    k_total = s + 1
    cdf_b = jnp.zeros((r, nf), f32)
    cdf_a = jnp.zeros((r, nf), f32)
    t_b = jnp.zeros((r, nf), f32)
    t_a = jnp.zeros((r, nf), f32)
    for k in range(k_total):
        lo = cdf[:, k:k + 1]
        hi = (
            jnp.full((r, 1), jnp.inf, f32)
            if k + 1 == k_total
            else cdf[:, k + 1:k + 2]
        )
        m = jnp.logical_and(lo <= u, u < hi).astype(f32)  # (R, NF)
        ka = min(k + 1, k_total - 1)  # shift-up clamp for 'above' values
        cdf_b = cdf_b + m * lo
        cdf_a = cdf_a + m * cdf[:, ka:ka + 1]
        t_b = t_b + m * t_mid_ext[:, k:k + 1]
        t_a = t_a + m * t_mid_ext[:, ka:ka + 1]

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    frac = (u - cdf_b) / denom
    t_f = t_b + frac * (t_a - t_b)       # (R, NF), ascending (u sorted)

    # ---- 2-way sorted merge via rank positions ----
    count_c = jnp.zeros((r, s), f32)
    for j in range(nf):
        count_c = count_c + (t_f[:, j:j + 1] < t_c).astype(f32)
    count_f = jnp.zeros((r, nf), f32)
    for i in range(s):
        count_f = count_f + (t_c[:, i:i + 1] <= t_f).astype(f32)
    pos_c = iota_row(s) + count_c     # (R, S)
    pos_f = iota_row(nf) + count_f    # (R, NF)

    m_all = s + nf
    iota_all = iota_row(m_all)
    t_all = jnp.zeros((r, m_all), f32)
    # positions are exact small integers in f32 — equality is exact
    for i in range(s):
        t_all = t_all + jnp.where(
            iota_all == pos_c[:, i:i + 1], t_c[:, i:i + 1], 0.0
        )
    for j in range(nf):
        t_all = t_all + jnp.where(
            iota_all == pos_f[:, j:j + 1], t_f[:, j:j + 1], 0.0
        )
    out_ref[:] = t_all


def sample_pdf_union(
    t_vals: jnp.ndarray,
    weights: jnp.ndarray,
    ns_fine: int,
    u_sorted: jnp.ndarray | None = None,
    tile_rays: int = _TILE_RAYS,
) -> jnp.ndarray:
    """Fused equivalent of ``sorted_union(t_vals, sample_pdf(...))``.

    With ``u_sorted=None``: the deterministic eval u-grid (matches
    ``sample_pdf(None, t_mid, weights, ns_fine, deterministic=True)``).
    With ``u_sorted`` of shape ``(B, NF)``: caller-supplied uniforms,
    SORTED ascending along the fine axis — the training path draws iid
    uniforms and sorts them (order is irrelevant to the union).

    Args:
        t_vals: ``(B, S)`` ascending coarse sample distances.
        weights: ``(B, S)`` coarse compositing weights.
        ns_fine: fine samples per ray (NF).

    Returns:
        ``(B, S + NF)`` ascending union of coarse and fine t-values.
    """
    b, s = t_vals.shape
    if ns_fine == 0:
        return t_vals
    r = min(tile_rays, max(8, ((b + 7) // 8) * 8))
    b_pad = ((b + r - 1) // r) * r
    grid = b_pad // r
    has_u = u_sorted is not None

    def pad(a):
        if a.shape[0] == b_pad:
            return a
        return jnp.pad(a, ((0, b_pad - a.shape[0]), (0, 0)))

    # Padded rays: strictly increasing t, uniform weights — valid inputs.
    t_pad_rows = jnp.broadcast_to(
        jnp.arange(1, s + 1, dtype=t_vals.dtype), (b_pad - b, s)
    )
    t2 = (
        jnp.concatenate([t_vals, t_pad_rows], axis=0)
        if b_pad != b
        else t_vals
    )
    w2 = pad(weights)

    ray_spec = [
        pl.BlockSpec((r, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [t2, w2]
    if has_u:
        ray_spec.append(
            pl.BlockSpec((r, ns_fine), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        # Padded rays reuse the eval grid (any sorted vector is valid).
        u_pad = jnp.broadcast_to(
            (jnp.arange(ns_fine, dtype=jnp.float32) + 0.5) / ns_fine,
            (b_pad - b, ns_fine),
        )
        operands.append(
            jnp.concatenate([u_sorted, u_pad], axis=0)
            if b_pad != b
            else u_sorted
        )

    kernel = functools.partial(_pdf_union_kernel, s, ns_fine, has_u)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=ray_spec,
        out_specs=pl.BlockSpec((r, s + ns_fine), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, s + ns_fine), jnp.float32),
        # The unrolled bin/merge loops keep several (R, S+NF) f32 temps
        # live at once: ~28 MB scoped at R=256 — over the default 16 MB
        # cap (measured OOM), well inside physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=_should_interpret(),
    )(*operands)
    return out[:b]


def sample_pdf_union_eval(
    t_vals: jnp.ndarray,
    weights: jnp.ndarray,
    ns_fine: int,
    tile_rays: int = _TILE_RAYS,
) -> jnp.ndarray:
    """Deterministic-eval variant (shared sorted u-grid in-kernel)."""
    return sample_pdf_union(t_vals, weights, ns_fine, tile_rays=tile_rays)
