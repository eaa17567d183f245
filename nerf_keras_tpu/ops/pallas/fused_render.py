"""Fused MLP + volume-render training kernel: composite in VMEM.

Completes the SURVEY.md §7 ray-march fusion for the TRAINING path: tiles
are ray-aligned (R whole rays x S samples per grid step), and the alpha
compositing of ops/volume.py runs in-kernel right after the MLP, so the
``(B*S, 4)`` raw predictions — which the TPU stores lane-padded to 128,
i.e. 32x their logical bytes — never round-trip HBM in either direction.
Per fine pass at the flagship batch that removes ~1.6 GB of padded
traffic (preds out + volume-render in, cotangent out + backward in).

Scope (enforced by the caller, engine/step.py):

* detached importance sampling (``stop_pdf_gradient``, the default):
  the backward consumes ONLY the rgb cotangent.  Cotangents w.r.t. the
  per-ray weights, t-values and encodings are structurally zero in that
  regime and are returned as zeros without being computed.

Forward per tile: MLP (shared `_forward_tile`) → move the sigma/rgb
columns into (R, S) tiles via exact selector matmuls (Mosaic cannot
reshape across the sublane/lane boundary) → delta/alpha/exclusive
transmittance (exp of a shifted log-scan; Mosaic has no cumprod/cumsum
lowering)/weights exactly as ops/volume.py (1e10 terminal delta, eps
inside the cumulative product) → composite rgb.  Backward recomputes the
tile and applies the analytic volume-render VJP (suffix-sum form) to
build the (T, 4) prediction cotangent, then reuses the shared MLP reverse
walk to accumulate dW/db.

Parity: tests/test_pallas.py pins fwd (rgb + weights) and weight grads
against encode→apply_nerf_mlp→volume_render in interpret mode.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_keras_tpu.ops.pallas.fused_mlp import (
    Params,
    _flatten_params,
    _forward_tile,
    _mlp_bwd_tile,
    _n_flat,
    _should_interpret,
)

_EPS = 1e-10
_TERMINAL_DELTA = 1e10

# Rays per grid step.  S samples/ray make the point tile R*S; the backward
# additionally holds all per-layer activations + f32 dW accumulators in
# VMEM, so it uses fewer rays (and raises the scoped-vmem cap — see the
# backward pallas_call).
# Round-3 sweeps (scripts/exp_bwd_r3.py, exp_tiles2.py) with the blocked
# (linear-in-R) selectors confirmed SMALL ray tiles win — the streaming
# operands pipeline better against the resident dW/weight blocks:
#   fine  (S=192): fwd r=16 (12.4 ms vs 12.5 at r=8, 14.5 at r=32);
#                  bwd r=8  (19.5 ms vs 23.9 at r=16);
#   coarse (S=64): fwd r=32 (5.97 ms vs 6.40 at r=64);
#                  bwd r=8  (13.5 ms fwd+bwd vs 13.7 at r=16).
# The per-S defaults below encode that table; explicit max_tile_* args
# (sweep scripts) override it.


def _default_tiles(s: int) -> tuple[int, int]:
    """Measured-optimal (fwd, bwd) point-tile budgets for S samples/ray."""
    if s <= 96:  # coarse-pass regime
        return 32 * s, 8 * s
    return 16 * s, 8 * s


def _rays_per_tile(num_samples: int, max_points: int) -> int:
    """Largest multiple-of-8 ray count with R*S <= max_points (min 8 —
    Mosaic requires the sublane block dimension divisible by 8)."""
    r = max_points // max(num_samples, 1)
    return max(8, (r // 8) * 8)


# Rays per selector block.  The selector matmuls cost O(G * S^2) FLOPs per
# G-ray block, i.e. LINEAR in the ray tile R (round 2's single (R, R*S)
# selector cost O(R^2 S^2) — quadratic in R — which is what made ray tiles
# past 8 measure worse and capped the backward at 512 tiny grid steps).
# Blocking also makes the constants' VMEM footprint O(S^2), independent
# of R.  8 = the f32 sublane quantum; every ray tile is a multiple of it.
_SEL_GROUP = 8


def _segment_selectors(s: int, g: int = _SEL_GROUP):
    """One-hot selector constants for exact (R*S, 1) <-> (R, S) movement,
    applied per G-ray block.

    Mosaic cannot reshape across the sublane/lane boundary
    ("infer-vector-layout: unsupported shape cast" for
    vector<RxS> -> vector<RSx1>), so per-sample columns are moved between
    the flat point layout and the per-ray tile layout with f32 selector
    matmuls, which are exact (one product per output element).  Per block k
    covering rays [k*G, (k+1)*G):

        to_rs(v)_k   = A @ (v_k * B)             (G*S,1) -> (G,S)
        from_rs(W)_k = rowsum((At @ W_k) * B)    (G,S)   -> (G*S,1)
        expand(v)_k  = At @ v_k                  (G,W)   -> (G*S,W)

    where A[r, j] = [j // S == r], At = A^T (precomputed so every in-kernel
    dot is in the native NN orientation — no contraction over sublanes),
    and B[j, c] = [j % S == c].
    """
    a = np.zeros((g, g * s), dtype=np.float32)
    b = np.zeros((g * s, s), dtype=np.float32)
    for k in range(g * s):
        a[k // s, k] = 1.0
        b[k, k % s] = 1.0
    return a, np.ascontiguousarray(a.T), b


def _sel_consts(s: int):
    """Selector constants as jnp arrays: (a, at, b)."""
    return tuple(jnp.asarray(c) for c in _segment_selectors(s))


# Mosaic, like XLA-on-TPU, runs f32 dot operands through ONE-PASS bf16 at
# DEFAULT precision.  Every dot in this file that carries f32 VALUES (the
# selector movements of sigma/t/cotangents, the encode matmul) must pin
# precision=HIGHEST: the silent truncation (a) destroyed encode octaves
# >= 6 — sin-argument error ~ 2^9 * bf16_eps * |p| = several radians, so
# half the positional features trained as noise — and (b) bf16-rounded
# every value moved between layouts (measured 1.9e-3 round-trip error and
# a 3.9x train-gradient-error inflation vs f32 truth on the real v5e;
# docs/PERF.md round-3 precision-fix section).  CPU interpret mode
# computes true f32, so only on-hardware probes could catch this.
#
# Fix shape (measured): Mosaic supports only DEFAULT and HIGHEST (HIGH
# raises), and its HIGHEST lowering of the selector dots costs +20 ms on
# the flagship step — wildly out of proportion to their ~1.5% FLOP share.
# Instead, every f32 VALUE moved through a one-hot selector is split into
# THREE bf16 limbs (v = v1 + v2 + v3 captures all 24 mantissa bits) and
# moved with three DEFAULT-precision MXU dots: each limb is
# bf16-representable, so the one-pass-bf16 truncation is lossless and the
# sum reconstructs the f32 exactly (bit-exact in the hardware probe).
# Cost: ~3x a negligible MAC count (+~1 ms/step).  The encode matmul
# (K=4, tiny) keeps precision=HIGHEST.
_EXACT_ENC = jax.lax.Precision.HIGHEST


def _nn_dot(a, b):
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _limbs3(v):
    """Split f32 into three bf16-representable limbs, v == v1 + v2 + v3."""
    v1 = v.astype(jnp.bfloat16).astype(jnp.float32)
    r = v - v1
    v2 = r.astype(jnp.bfloat16).astype(jnp.float32)
    return v1, v2, r - v2


def _nn_dot_exact(a, b):
    """a @ b where ``a`` is an EXACT one-hot selector and ``b`` carries
    f32 values: three limb dots at DEFAULT precision, exact
    reconstruction (see the precision note above)."""
    b1, b2, b3 = _limbs3(b)
    return _nn_dot(a, b1) + _nn_dot(a, b2) + _nn_dot(a, b3)


def _cat0(blocks):
    return blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=0)


# Movement precision policy (measured; docs/PERF.md round-3
# precision-fix section): values that feed the ENCODE — o, d, t — must
# move EXACTLY (a bf16-rounded position scales by 2^9 into radians of
# phase error at the top octaves), so their movements use the 3-limb
# form (_from_rs_x / _expand_rows_x).  All other moved values (sigma,
# rgb, cotangents) are homogeneous-linear in the result: plain-DEFAULT
# movement rounds them at bf16 relative scale — the same noise class as
# the bf16 MLP dots both train paths already accept (measured: train
# gradients land at XLA-bf16's own error level).  Uniform 3-limb
# movement measured +10 ms/step for no measurable gradient gain.
#
# ROUND 5 (sample-major lever, CLOSED BY MEASUREMENT): Mosaic on
# jax/jaxlib 0.9.0 now lowers the WIDEN reshape ((R*S,1)->(R,S)) and
# broadcast+reshape expansion bit-exactly (the round-3 toolchain raised
# "unsupported shape cast"; probe: docs/evidence/sample_major_probe
# .json), while the NARROW direction ((R,S)->(R*S,1)) still does not,
# and explicit-DMA variants fail with pinned internal errors.  The
# compiling subset was swapped in and A/B'd on hardware
# (docs/evidence/reshape_moves_ab.json): the reshape step runs 43.4 ms
# vs the selector step's 31.8 (0.73x) and the serving render chunk
# 59.5 vs 44.4 ms — Mosaic's cross-boundary reshape is a slow VPU
# relayout, losing to the MXU one-hot dots by far more than the
# selector FLOPs cost.  The selector design therefore REMAINS the
# default; NKT_RESHAPE_MOVES=1 re-enables the measured-slower reshape
# path for future-toolchain re-probes.
_RESHAPE_MOVES = os.environ.get("NKT_RESHAPE_MOVES", "0") == "1"


def _to_rs(v, a_ref, b_ref):
    """(R*S, 1) column -> (R, S) tile (reshape: exact; selector fallback:
    bf16-rounded)."""
    gs, s = b_ref.shape
    if _RESHAPE_MOVES:
        return v.reshape(v.shape[0] // s, s)
    b = b_ref[:]
    a = a_ref[:]
    return _cat0([
        _nn_dot(a, v[k * gs:(k + 1) * gs, :] * b)
        for k in range(v.shape[0] // gs)
    ])


def _from_rs(w, at_ref, b_ref):
    """(R, S) tile -> (R*S, 1) column, per G-ray block (bf16-rounded).

    NOT reshape-able: Mosaic 0.9.0 lowers the widen direction
    ((R*S,1)->(R,S)) and broadcast-expand, but the narrow direction here
    still raises 'infer-vector-layout: unsupported shape cast'
    (tpu.reshape vector<16x160xf32> -> vector<2560x1xf32>; pinned in
    docs/evidence/reshape_moves_ab.json) — so both _from_rs forms keep
    the selector movement under either flag value."""
    gs, g = at_ref.shape
    at = at_ref[:]
    b = b_ref[:]
    return _cat0([
        jnp.sum(_nn_dot(at, w[k * g:(k + 1) * g, :]) * b,
                axis=-1, keepdims=True)
        for k in range(w.shape[0] // g)
    ])


def _from_rs_x(w, at_ref, b_ref):
    """EXACT (R, S) -> (R*S, 1): 3-limb selector movement for encode
    inputs (t).  See _from_rs for why this direction cannot reshape."""
    gs, g = at_ref.shape
    at = at_ref[:]
    b = b_ref[:]
    return _cat0([
        jnp.sum(_nn_dot_exact(at, w[k * g:(k + 1) * g, :]) * b,
                axis=-1, keepdims=True)
        for k in range(w.shape[0] // g)
    ])


def _expand_rows(v, at_ref):
    """(R, W) per-ray rows -> (R*S, W) per-sample rows: row j is
    ``v[j // S]`` (broadcast+reshape: exact; selector fallback:
    bf16-rounded)."""
    gs, g = at_ref.shape
    if _RESHAPE_MOVES:
        r, w = v.shape
        s = gs // g
        return jnp.broadcast_to(v[:, None, :], (r, s, w)).reshape(r * s, w)
    at = at_ref[:]
    return _cat0([
        _nn_dot(at, v[k * g:(k + 1) * g, :])
        for k in range(v.shape[0] // g)
    ])


def _expand_rows_x(v, at_ref):
    """EXACT (R, W) -> (R*S, W) for encode inputs (origins/directions):
    broadcast+reshape, or the 3-limb selector movement on fallback."""
    if _RESHAPE_MOVES:
        return _expand_rows(v, at_ref)
    gs, g = at_ref.shape
    at = at_ref[:]
    return _cat0([
        _nn_dot_exact(at, v[k * g:(k + 1) * g, :])
        for k in range(v.shape[0] // g)
    ])


def _cumsum_lanes(x, s: int):
    """Inclusive prefix sum along the lane (last) axis.

    Mosaic has no lowering for the cumsum/cumprod primitives; this is the
    standard log2(S)-step shifted-add scan built from concat/slice/add,
    which all lower.  ~log2(S) passes over an (R, S) tile — microseconds.
    """
    shift = 1
    while shift < s:
        shifted = jnp.concatenate(
            [jnp.zeros_like(x[..., :shift]), x[..., :-shift]], axis=-1
        )
        x = x + shifted
        shift *= 2
    return x


def _one_minus_alpha(alpha):
    """``1 - alpha + eps`` written so XLA cannot reassociate it into
    ``(1 + eps) - alpha`` — which folds to ``1 - alpha`` in f32 and turns
    the backward's division into 0/0 at opaque samples (measured: the
    naive expression produced denom == 0.0 where alpha == 1.0)."""
    return jnp.maximum(1.0 - alpha, 0.0) + _EPS


def _volume_render_tile(preds, t, a_ref, b_ref, r, s):
    """ops/volume.py:volume_render on one (R*S, 4) tile -> per-ray
    composites; returns (rgb (R,3), weights (R,S)) plus the intermediates
    the backward reuses.  Row<->tile movement goes through the blocked
    selector matmuls (no cross-boundary reshapes)."""
    sigma = _to_rs(jnp.maximum(preds[:, 3:4], 0.0), a_ref, b_ref)
    delta = jnp.diff(t, axis=-1)
    delta = jnp.concatenate(
        [delta, jnp.full_like(delta[..., :1], _TERMINAL_DELTA)], axis=-1
    )
    alpha = 1.0 - jnp.exp(-sigma * delta)
    # Exclusive cumulative transmittance.  Mosaic has no cumprod lowering;
    # exp(exclusive-cumsum(log)) is equivalent (the factors are >= eps > 0)
    # and numerically kinder for long products of small factors.
    log_f = jnp.log(_one_minus_alpha(alpha))
    cs = _cumsum_lanes(log_f, s)
    cs_excl = jnp.concatenate(
        [jnp.zeros_like(cs[..., :1]), cs[..., :-1]], axis=-1
    )
    trans = jnp.exp(cs_excl)
    weights = alpha * trans

    rgb = jax.nn.sigmoid(preds[:, :3])
    rgb_rs = [_to_rs(rgb[:, c:c + 1], a_ref, b_ref) for c in range(3)]
    comp = [
        jnp.sum(weights * rc, axis=-1, keepdims=True) for rc in rgb_rs
    ]
    rgb_out = jnp.concatenate(comp, axis=-1)
    return rgb_out, weights, (sigma, delta, alpha, trans, rgb_rs)


def _fwd_kernel(num_layers, skip_layer, compute_dtype, r, s,
                x_ref, d_ref, t_ref, a_ref, at_ref, b_ref, *refs):
    rgb_ref, w_ref = refs[-2], refs[-1]
    wr = refs[:-2]
    preds, _ = _forward_tile(
        wr, x_ref[:], d_ref[:], num_layers, skip_layer, compute_dtype
    )
    rgb_out, weights, _ = _volume_render_tile(
        preds, t_ref[:], a_ref, b_ref, r, s
    )
    rgb_ref[:] = rgb_out
    w_ref[:] = weights


def _bwd_kernel(num_layers, skip_layer, compute_dtype, hidden, r, s,
                x_ref, d_ref, t_ref, g_ref, a_ref, at_ref, b_ref, *refs):
    """Recompute MLP + volume render, apply the compositing VJP to the
    per-ray rgb cotangent, then the shared MLP reverse walk (dW/db only)."""
    n_w = _n_flat(num_layers)
    wr = refs[:n_w]
    dw_refs = refs[n_w:]
    _bwd_core(wr, dw_refs, x_ref[:], d_ref[:], t_ref, g_ref,
              a_ref, at_ref, b_ref,
              num_layers, skip_layer, compute_dtype, hidden, r, s)


def _bwd_core(wr, dw_refs, x_enc, d_enc, t_ref, g_ref, a_ref, at_ref, b_ref,
              num_layers, skip_layer, compute_dtype, hidden, r, s,
              gw_ref=None):
    """Shared backward tile body: recompute forward, volume-render VJP,
    MLP reverse walk accumulating dW/db across grid steps.

    ``gw_ref`` (optional, (R, S)): an EXTERNAL cotangent on the
    compositing weights themselves — weight-space losses (the distortion
    regularizer, opacity/entropy penalties) differentiate through the
    kernel's weights output.  It seeds ``dw_sum``, so the existing
    dalpha/dsigma chain propagates it to the density head for free; rgb
    logits are untouched (weights do not feed them)."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in dw_refs:
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    preds, res = _forward_tile(
        wr, x_enc, d_enc, num_layers, skip_layer, compute_dtype
    )
    _, _, (sigma, delta, alpha, trans, rgb_rs) = _volume_render_tile(
        preds, t_ref[:], a_ref, b_ref, r, s
    )
    drgb_out = g_ref[:].astype(jnp.float32)  # (R, 3)

    # d(rgb_out)/d(rgb_s) and /d(weights_s):
    #   rgb_out[c] = sum_s w_s * rgb_s[c]
    dlogits = []
    if gw_ref is None:
        dw_sum = jnp.zeros((r, s), jnp.float32)
    else:
        dw_sum = gw_ref[:].astype(jnp.float32)
    for c in range(3):
        rgb_c = rgb_rs[c]
        dc = drgb_out[:, c:c + 1]  # (R, 1) broadcasts over S
        dw_sum = dw_sum + dc * rgb_c
        # sigmoid VJP back to the raw logits
        dlogits.append(
            _from_rs(dc * alpha * trans * rgb_c * (1.0 - rgb_c),
                     at_ref, b_ref)
        )

    # dalpha_s = T_s * dw_s - (sum_{t>s} w_t * dw_t) / (1 - alpha_s + eps).
    # Exclusive suffix sum as total - inclusive prefix (no lane reversals).
    p = alpha * trans * dw_sum
    suffix_excl = jnp.sum(p, axis=-1, keepdims=True) - _cumsum_lanes(p, s)
    dalpha = trans * dw_sum - suffix_excl / _one_minus_alpha(alpha)
    # alpha = 1 - exp(-sigma * delta); sigma = relu(preds[:, 3]).
    # Multiply (delta * exp(-sigma*delta)) FIRST: with the 1e10 terminal
    # delta, (dalpha * delta) can overflow to inf before the exp()->0
    # factor cancels it, yielding NaN where autodiff's ordering gives 0.
    dsigma = dalpha * (delta * jnp.exp(-sigma * delta))
    dsigma = dsigma * (sigma > 0.0).astype(jnp.float32)
    dpreds = jnp.concatenate(
        dlogits + [_from_rs(dsigma, at_ref, b_ref)], axis=-1
    )

    _mlp_bwd_tile(
        wr, dw_refs, res, dpreds, num_layers, skip_layer, compute_dtype,
        hidden, need_input_grads=False,
    )


def _bwd_encode_kernel(num_layers, skip_layer, compute_dtype, hidden, r, s,
                       dx, dd, has_gw, o_ref, d_ref, t_ref, g_ref, *rest):
    """Backward over raw rays: re-run the in-VMEM expand + Fourier encode
    (see _fwd_encode_kernel for why XLA-side encodings are a trap), then
    the shared backward core.  Encoding transcendentals thus run twice per
    step (fwd + this recompute) — measured cheaper than the lane-padded
    XLA encode chain they replace (docs/PERF.md round-2 section).

    ``has_gw``: an extra (R, S) weights-cotangent operand follows
    ``g_ref`` (the ``weights_grad`` path)."""
    if has_gw:
        gw_ref, a_ref, at_ref, b_ref, ex_ref, ed_ref, *refs = rest
    else:
        gw_ref = None
        a_ref, at_ref, b_ref, ex_ref, ed_ref, *refs = rest
    n_w = _n_flat(num_layers)
    wr = refs[:n_w]
    dw_refs = refs[n_w:]
    x_enc, d_enc = _expand_encode(
        o_ref, d_ref, t_ref, a_ref, at_ref, b_ref, ex_ref, ed_ref, dx, dd,
        compute_dtype,
    )
    _bwd_core(wr, dw_refs, x_enc, d_enc, t_ref, g_ref,
              a_ref, at_ref, b_ref,
              num_layers, skip_layer, compute_dtype, hidden, r, s,
              gw_ref=gw_ref)


def _bwd_xres_kernel(num_layers, skip_layer, compute_dtype, hidden, r, s,
                     dd, has_gw, d_ref, t_ref, g_ref, *rest):
    """Backward with position encodings as residuals (``bwd_mode=
    "residual"``): the forward already wrote the expensive (R*S, 63)
    position encodings to HBM; the per-RAY direction features are merely
    re-encoded here in VMEM (R transcendental rows, S x fewer than the
    sample count) and expanded with the exact selector — so the direction
    residual's lane-padded (R*S, 128-tile) HBM write+read is skipped for
    ~zero recompute.

    ``has_gw``: an extra (R, S) weights-cotangent operand follows
    ``g_ref`` (the ``weights_grad`` path)."""
    if has_gw:
        gw_ref, x_ref, a_ref, at_ref, b_ref, ed_ref, *refs = rest
    else:
        gw_ref = None
        x_ref, a_ref, at_ref, b_ref, ed_ref, *refs = rest
    n_w = _n_flat(num_layers)
    wr = refs[:n_w]
    dw_refs = refs[n_w:]
    d_enc = _expand_rows(
        _encode_tile(d_ref[:], ed_ref, dd), at_ref
    ).astype(compute_dtype)
    _bwd_core(wr, dw_refs, x_ref[:], d_enc, t_ref, g_ref,
              a_ref, at_ref, b_ref,
              num_layers, skip_layer, compute_dtype, hidden, r, s,
              gw_ref=gw_ref)


def _const_spec(w) -> pl.BlockSpec:
    return pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_render(static, x_enc, d_enc, t_vals, *flat_params):
    return _fused_render_fwd_impl(static, x_enc, d_enc, t_vals, flat_params)


def _pad_rays(a, b_pad):
    if a.shape[0] == b_pad:
        return a
    pad = [(0, b_pad - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad)


def _vmem_cap(points: int) -> int:
    """Scoped-VMEM cap for a kernel streaming ``points``-sample tiles.

    The backward holds the per-layer activations (~6 KB/point bf16 at
    hidden 256) plus the f32 dW accumulators, selector constants and
    double-buffered inputs; the historical fixed 48 MB cap allowed only
    ~1.5K-point tiles.  Scale with the tile (generously — the cap is a
    compiler check, not a reservation) and clamp below physical VMEM.
    """
    return int(min(112, 32 + points * 10 // 1024)) * 1024 * 1024


def _fused_render_fwd_impl(static, x_enc, d_enc, t_vals, flat_params):
    num_layers, skip_layer, compute_dtype_name, r_fwd, _ = static
    compute_dtype = jnp.dtype(compute_dtype_name)
    b, s = t_vals.shape
    b_pad = ((b + r_fwd - 1) // r_fwd) * r_fwd
    grid = b_pad // r_fwd
    tile = r_fwd * s

    kernel = functools.partial(
        _fwd_kernel, num_layers, skip_layer, compute_dtype, r_fwd, s
    )
    x2 = _pad_rays(x_enc.reshape(b, s, -1), b_pad).reshape(b_pad * s, -1)
    d2 = _pad_rays(d_enc.reshape(b, s, -1), b_pad).reshape(b_pad * s, -1)
    # Padded rays get strictly increasing t so delta/cumprod stay finite.
    t_pad = jnp.broadcast_to(
        jnp.arange(1, s + 1, dtype=t_vals.dtype), (b_pad - b, s)
    )
    t2 = jnp.concatenate([t_vals, t_pad], axis=0) if b_pad != b else t_vals
    sel_a, sel_at, sel_b = _sel_consts(s)

    rgb, weights = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, x2.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d2.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_fwd, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(sel_a),
            _const_spec(sel_at),
            _const_spec(sel_b),
            *[_const_spec(w) for w in flat_params],
        ],
        out_specs=[
            pl.BlockSpec((r_fwd, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_fwd, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, s), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_cap(tile)
        ),
        interpret=_should_interpret(),
    )(x2, d2, t2, sel_a, sel_at, sel_b, *flat_params)
    return rgb[:b], weights[:b]


def _fused_render_fwd(static, x_enc, d_enc, t_vals, *flat_params):
    out = _fused_render_fwd_impl(static, x_enc, d_enc, t_vals, flat_params)
    return out, (x_enc, d_enc, t_vals, flat_params)


def _fused_render_bwd(static, residuals, g):
    num_layers, skip_layer, compute_dtype_name, _, r_bwd = static
    compute_dtype = jnp.dtype(compute_dtype_name)
    x_enc, d_enc, t_vals, flat_params = residuals
    g_rgb, _g_weights = g  # weights cotangent structurally zero (detached)
    b, s = t_vals.shape
    b_pad = ((b + r_bwd - 1) // r_bwd) * r_bwd
    grid = b_pad // r_bwd
    tile = r_bwd * s
    hidden = flat_params[0].shape[1]

    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat_params]
    kernel = functools.partial(
        _bwd_kernel, num_layers, skip_layer, compute_dtype, hidden, r_bwd, s
    )
    x2 = _pad_rays(x_enc.reshape(b, s, -1), b_pad).reshape(b_pad * s, -1)
    d2 = _pad_rays(d_enc.reshape(b, s, -1), b_pad).reshape(b_pad * s, -1)
    t_pad = jnp.broadcast_to(
        jnp.arange(1, s + 1, dtype=t_vals.dtype), (b_pad - b, s)
    )
    t2 = jnp.concatenate([t_vals, t_pad], axis=0) if b_pad != b else t_vals
    g2 = _pad_rays(g_rgb, b_pad)  # zero cotangent on padded rays
    sel_a, sel_at, sel_b = _sel_consts(s)

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, x2.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d2.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_bwd, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_bwd, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(sel_a),
            _const_spec(sel_at),
            _const_spec(sel_b),
            *[_const_spec(w) for w in flat_params],
        ],
        out_specs=[_const_spec(sh) for sh in dw_shapes],
        out_shape=dw_shapes,
        # The backward holds per-layer activations for a full R*S-point
        # tile plus the f32 dW accumulators — far above the DEFAULT 16 MB
        # scoped-vmem cap but inside the chip's physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_cap(tile)
        ),
        interpret=_should_interpret(),
    )(x2, d2, t2, g2, sel_a, sel_at, sel_b, *flat_params)
    dws = [dv.astype(w.dtype) for w, dv in zip(flat_params, outs)]
    return (
        jnp.zeros_like(x_enc),
        jnp.zeros_like(d_enc),
        jnp.zeros_like(t_vals),
        *dws,
    )


_fused_render.defvjp(_fused_render_fwd, _fused_render_bwd)


def _encode_consts(d: int, num_freqs: int):
    """Constants for in-kernel Fourier encoding of (T, d) coordinates.

    Returns ``(E, n_id)`` where ``E`` is the (d+1, W)
    selector-with-frequency-and-phase matrix: with ``p1 = [p | 1]``,
    column c of ``p1 @ E`` equals ``2^{octave(c)} * p[:, dim(c)] +
    phase(c)`` (octave 0 / scale 1 / phase 0 for the identity block),
    matching ops/encoding.py's layout ``[x | sin(2^0 x), cos(2^0 x) |
    ...]``.  The phase row carries ``pi/2`` on the cos columns so ONE
    full-width sin sweep produces both features (``cos z = sin(z +
    pi/2)``).  Accuracy: the f32 rounding of ``z + pi/2`` perturbs the
    phase by up to ``ulp(z)/2``, which GROWS with the octave — ~4e-8 for
    small arguments but ~1e-4 rad at the flagship top octave (``z =
    2^9 * far`` ~ 3e3 rad), so top-octave features can differ from a
    direct ``cos`` by ~1e-4.  Harmless in practice: that phase error is
    far below the bf16 quantization (~4e-3 relative) the features are
    stored at, and end-to-end TPU PSNR matches the jnp path
    (docs/PERF.md); pinned by an explicit l_xyz=10 large-argument test
    with an honest 1e-3 tolerance (tests/test_pallas.py).
    ``n_id = d`` identity columns come first.
    """
    w = d + 2 * d * num_freqs
    e = np.zeros((d + 1, w), dtype=np.float32)
    for j in range(d):
        e[j, j] = 1.0
    for i in range(num_freqs):
        for j in range(d):
            e[j, d + (2 * i) * d + j] = 2.0**i      # sin block
            e[j, d + (2 * i + 1) * d + j] = 2.0**i  # cos block
            e[d, d + (2 * i + 1) * d + j] = np.pi / 2  # cos via sin phase
    return e, d


def _encode_tile(p, e_ref, d: int):
    """Fourier-encode a (T, d) f32 tile fully in VMEM.

    One (T, d+1) x (d+1, W) matmul applies the per-column frequency
    scaling and the cos phase shift (exact scale: one nonzero per column,
    power-of-two), then a SINGLE full-width sin sweep and an iota-mask
    select reproduce ops/encoding.py's feature order.  Runs in f32 — the
    largest sin argument is ``2^{L-1} * far`` (~5e3 rad for Lego), where
    bf16 phase error would be catastrophic.
    """
    p1 = jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=-1)
    z = jax.lax.dot_general(
        p1, e_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_EXACT_ENC,  # bf16-truncated p makes octaves >= 6 noise
    )  # (T, W)
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, dimension=1)
    return jnp.where(col < d, z, jnp.sin(z))


def _expand_encode(o_ref, d_ref, t_ref, a_ref, at_ref, b_ref, ex_ref, ed_ref,
                   dx, dd, compute_dtype):
    """Expand (R, 3) rays to (R*S, ·) Fourier-encoded samples in VMEM.

    Per-sample expansion goes through the exact blocked one-hot selectors
    (:func:`_expand_rows`).
    """
    # EXACT movements: these values enter the encode, where bf16 rounding
    # scales by 2^(L-1) into radians of phase error (precision note above).
    o_exp = _expand_rows_x(o_ref[:], at_ref)     # (R*S, 3)
    d_exp = _expand_rows_x(d_ref[:], at_ref)     # (R*S, 3)
    t_flat = _from_rs_x(t_ref[:], at_ref, b_ref)  # (R*S, 1)
    points = o_exp + d_exp * t_flat

    x_enc = _encode_tile(points, ex_ref, dx).astype(compute_dtype)
    # Every sample on a ray shares its direction: encode (R, 3) once and
    # expand the (R, W) features with the exact selector matmul — S x
    # fewer direction transcendentals than encoding the expanded rows.
    d_enc = _expand_rows(
        _encode_tile(d_ref[:], ed_ref, dd), at_ref
    ).astype(compute_dtype)
    return x_enc, d_enc


def _fwd_encode_kernel(num_layers, skip_layer, compute_dtype, r, s, dx, dd,
                       emit_enc, o_ref, d_ref, t_ref, a_ref, at_ref, b_ref,
                       ex_ref, ed_ref, *refs):
    """Expand rays to samples, Fourier-encode, MLP, composite — all in
    VMEM.  Exists because the XLA-side encode chain materializes (N, 3)
    points and (N, 63)/(N, 27) encodings, which TPU lane-pads to 128
    (42x / 2x / 4.7x their logical bytes) and lowers into slow
    tile-padded VPU loop fusions (~4.5 ms per 1M points measured via HLO
    cost analysis, docs/PERF.md round-2 section).

    With ``emit_enc`` the POSITION encodings are additionally written out
    (training residuals for the x-residual backward — one HBM write so the
    backward never re-runs the per-sample position transcendentals; the
    per-RAY direction features are cheap enough to re-encode there).
    """
    if emit_enc:
        rgb_ref, w_ref, xo_ref = refs[-3:]
        wr = refs[:-3]
    else:
        rgb_ref, w_ref = refs[-2], refs[-1]
        wr = refs[:-2]
    x_enc, d_enc = _expand_encode(
        o_ref, d_ref, t_ref, a_ref, at_ref, b_ref, ex_ref, ed_ref, dx, dd,
        compute_dtype,
    )
    if emit_enc:
        xo_ref[:] = x_enc
    preds, _ = _forward_tile(
        wr, x_enc, d_enc, num_layers, skip_layer, compute_dtype
    )
    rgb_out, weights, _ = _volume_render_tile(
        preds, t_ref[:], a_ref, b_ref, r, s
    )
    rgb_ref[:] = rgb_out
    w_ref[:] = weights


def _pad_ray_batch(origins, directions, t_vals, b, s, b_pad):
    """Pad rays to the tile multiple; padded rays get strictly increasing
    t so delta/cumprod stay finite."""
    o2 = _pad_rays(origins.astype(jnp.float32), b_pad)
    d2 = _pad_rays(directions.astype(jnp.float32), b_pad)
    t_pad = jnp.broadcast_to(
        jnp.arange(1, s + 1, dtype=t_vals.dtype), (b_pad - b, s)
    )
    t2 = jnp.concatenate([t_vals, t_pad], axis=0) if b_pad != b else t_vals
    return o2, d2, t2


def _ray_specs(r, s):
    """BlockSpecs for the (origins, dirs, t) ray-tile operands."""
    return [
        pl.BlockSpec((r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_render_rays(static, origins, dirs, t_vals, *flat_params):
    return _fused_render_rays_fwd_impl(static, origins, dirs, t_vals,
                                       flat_params)


def _fused_render_rays_fwd_impl(static, origins, dirs, t_vals, flat_params,
                                emit_enc=False):
    (num_layers, skip_layer, cdt_name, r_fwd, _, l_xyz, l_dir, _mode,
     _wgrad) = static
    cdt = jnp.dtype(cdt_name)
    b, s = t_vals.shape
    b_pad = ((b + r_fwd - 1) // r_fwd) * r_fwd
    grid = b_pad // r_fwd
    tile = r_fwd * s

    o2, d2, t2 = _pad_ray_batch(origins, dirs, t_vals, b, s, b_pad)
    sel_a, sel_at, sel_b = _sel_consts(s)
    ex, dx = _encode_consts(3, l_xyz)
    ed, dd = _encode_consts(3, l_dir)
    ex, ed = jnp.asarray(ex), jnp.asarray(ed)

    out_specs = [
        pl.BlockSpec((r_fwd, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r_fwd, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b_pad, 3), jnp.float32),
        jax.ShapeDtypeStruct((b_pad, s), jnp.float32),
    ]
    if emit_enc:
        out_specs.append(
            pl.BlockSpec((tile, ex.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b_pad * s, ex.shape[1]), cdt)
        )

    kernel = functools.partial(
        _fwd_encode_kernel, num_layers, skip_layer, cdt, r_fwd, s, dx, dd,
        emit_enc,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            *_ray_specs(r_fwd, s),
            _const_spec(sel_a),
            _const_spec(sel_at),
            _const_spec(sel_b),
            _const_spec(ex),
            _const_spec(ed),
            *[_const_spec(w) for w in flat_params],
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_cap(tile)
        ),
        interpret=_should_interpret(),
    )(o2, d2, t2, sel_a, sel_at, sel_b, ex, ed, *flat_params)
    rgb, weights = outs[0][:b], outs[1][:b]
    if emit_enc:
        return rgb, weights, outs[2][:b * s]
    return rgb, weights


def _fused_render_rays_fwd(static, origins, dirs, t_vals, *flat_params):
    mode = static[7]
    if mode == "residual":
        rgb, weights, x2 = _fused_render_rays_fwd_impl(
            static, origins, dirs, t_vals, flat_params, emit_enc=True
        )
        # Residuals: the kernel-computed POSITION encodings (the per-sample
        # transcendentals run once) plus the raw dirs — the backward
        # re-encodes directions per RAY in VMEM, which is S x cheaper than
        # a lane-padded (B*S, 27) residual round-trip.
        return (rgb, weights), ((x2, dirs), t_vals, flat_params)
    out = _fused_render_rays_fwd_impl(static, origins, dirs, t_vals,
                                      flat_params)
    # Residuals are the RAW rays — (B, 3) instead of the (B*S, 63)
    # encodings the x-residual path keeps alive between fwd and bwd.
    return out, ((origins, dirs), t_vals, flat_params)


def _fused_render_rays_bwd(static, residuals, g):
    prim, t_vals, flat_params = residuals
    if static[7] == "residual":
        x2, dirs = prim
        dws = _fused_render_xres_bwd(static, x2, dirs, t_vals,
                                     flat_params, g)
        return (
            jnp.zeros((t_vals.shape[0], 3), jnp.float32),
            jnp.zeros_like(dirs),
            jnp.zeros_like(t_vals),
            *dws,
        )
    origins, dirs = prim
    return _fused_render_rays_bwd_recompute(static, origins, dirs, t_vals,
                                            flat_params, g)


def _fused_render_xres_bwd(static, x_enc, dirs, t_vals, flat_params, g):
    """Backward for ``bwd_mode="residual"``: position encodings arrive as
    residuals, direction features are re-encoded per ray in VMEM
    (:func:`_bwd_xres_kernel`).  Returns the dW list."""
    (num_layers, skip_layer, cdt_name, _, r_bwd, _l_xyz, l_dir, _mode,
     wgrad) = static
    cdt = jnp.dtype(cdt_name)
    # Without weights_grad the weights output is stop-gradiented by the
    # wrapper, so its cotangent is structurally zero and never loaded.
    g_rgb, g_weights = g
    b, s = t_vals.shape
    b_pad = ((b + r_bwd - 1) // r_bwd) * r_bwd
    grid = b_pad // r_bwd
    tile = r_bwd * s
    hidden = flat_params[0].shape[1]

    x2 = _pad_rays(x_enc.reshape(b, s, -1), b_pad).reshape(b_pad * s, -1)
    d2 = _pad_rays(dirs.astype(jnp.float32), b_pad)
    t_pad = jnp.broadcast_to(
        jnp.arange(1, s + 1, dtype=t_vals.dtype), (b_pad - b, s)
    )
    t2 = jnp.concatenate([t_vals, t_pad], axis=0) if b_pad != b else t_vals
    g2 = _pad_rays(g_rgb, b_pad)  # zero cotangent on padded rays
    sel_a, sel_at, sel_b = _sel_consts(s)
    ed, dd = _encode_consts(3, l_dir)
    ed = jnp.asarray(ed)

    gw_ops, gw_specs = [], []
    if wgrad:
        gw_ops = [_pad_rays(g_weights.astype(jnp.float32), b_pad)]
        gw_specs = [pl.BlockSpec((r_bwd, s), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]

    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                 for w in flat_params]
    kernel = functools.partial(
        _bwd_xres_kernel, num_layers, skip_layer, cdt, hidden, r_bwd, s, dd,
        wgrad,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((r_bwd, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_bwd, s), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_bwd, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *gw_specs,
            pl.BlockSpec((tile, x2.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(sel_a),
            _const_spec(sel_at),
            _const_spec(sel_b),
            _const_spec(ed),
            *[_const_spec(w) for w in flat_params],
        ],
        out_specs=[_const_spec(sh) for sh in dw_shapes],
        out_shape=dw_shapes,
        # Same scoped-vmem note as _fused_render_bwd.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_cap(tile)
        ),
        interpret=_should_interpret(),
    )(d2, t2, g2, *gw_ops, x2, sel_a, sel_at, sel_b, ed, *flat_params)
    return [dv.astype(w.dtype) for w, dv in zip(flat_params, outs)]


def _fused_render_rays_bwd_recompute(static, origins, dirs, t_vals,
                                     flat_params, g):
    (num_layers, skip_layer, cdt_name, _, r_bwd, l_xyz, l_dir, _mode,
     wgrad) = static
    cdt = jnp.dtype(cdt_name)
    g_rgb, g_weights = g  # weights cotangent zero unless weights_grad
    b, s = t_vals.shape
    b_pad = ((b + r_bwd - 1) // r_bwd) * r_bwd
    grid = b_pad // r_bwd
    hidden = flat_params[0].shape[1]

    o2, d2, t2 = _pad_ray_batch(origins, dirs, t_vals, b, s, b_pad)
    g2 = _pad_rays(g_rgb, b_pad)  # zero cotangent on padded rays
    sel_a, sel_at, sel_b = _sel_consts(s)
    ex, dx = _encode_consts(3, l_xyz)
    ed, dd = _encode_consts(3, l_dir)
    ex, ed = jnp.asarray(ex), jnp.asarray(ed)

    gw_ops, gw_specs = [], []
    if wgrad:
        gw_ops = [_pad_rays(g_weights.astype(jnp.float32), b_pad)]
        gw_specs = [pl.BlockSpec((r_bwd, s), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]

    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                 for w in flat_params]
    kernel = functools.partial(
        _bwd_encode_kernel, num_layers, skip_layer, cdt, hidden, r_bwd, s,
        dx, dd, wgrad,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            *_ray_specs(r_bwd, s),
            pl.BlockSpec((r_bwd, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *gw_specs,
            _const_spec(sel_a),
            _const_spec(sel_at),
            _const_spec(sel_b),
            _const_spec(ex),
            _const_spec(ed),
            *[_const_spec(w) for w in flat_params],
        ],
        out_specs=[_const_spec(sh) for sh in dw_shapes],
        out_shape=dw_shapes,
        # Same scoped-vmem note as _fused_render_bwd.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_cap(r_bwd * s)
        ),
        interpret=_should_interpret(),
    )(o2, d2, t2, g2, *gw_ops, sel_a, sel_at, sel_b, ex, ed, *flat_params)
    dws = [dv.astype(w.dtype) for w, dv in zip(flat_params, outs)]
    return (
        jnp.zeros_like(origins),
        jnp.zeros_like(dirs),
        jnp.zeros_like(t_vals),
        *dws,
    )


_fused_render_rays.defvjp(_fused_render_rays_fwd, _fused_render_rays_bwd)


def render_rays_fused(
    params: Params,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_vals: jnp.ndarray,
    *,
    l_xyz: int = 10,
    l_dir: int = 4,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    skip_layer: int = 4,
    max_tile_fwd: int | None = None,
    max_tile_bwd: int | None = None,
    bwd_mode: str = "residual",
    weights_grad: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ray megakernel over raw rays: sample positions, Fourier encoding,
    the full MLP, and alpha compositing never leave VMEM.

    This is the SURVEY.md §7 step-8 ray-march fusion over raw rays; it
    drives BOTH the inference/eval path and (since round 2) the training
    path.  ``bwd_mode`` picks the backward strategy:

    * ``"residual"`` (default): the forward also writes the in-VMEM
      POSITION encodings to HBM as residuals; the backward consumes them
      and merely re-encodes the per-RAY direction features in VMEM (S x
      fewer transcendentals than the sample count, and the lane-padded
      (B*S, 27->128) direction residual round-trip is skipped) — the
      expensive per-sample position transcendentals run once.
    * ``"recompute"``: residuals are the raw ``(B, 3)`` rays; the backward
      re-runs expand+encode in VMEM (measured ~4.5 ms/step slower at the
      flagship train shape — the recompute exceeds what the smaller
      residual traffic saves; kept for memory-constrained regimes).

    Args:
        params: MLP pytree (models/mlp.py layout).
        origins/directions: ``(B, 3)`` rays.
        t_vals: ``(B, S)`` ascending sample distances.

    Returns:
        ``(rgb, weights)``: ``(B, 3)`` f32 composited color
        (differentiable w.r.t. the MLP parameters) and ``(B, S)`` f32
        compositing weights.  By default the weights are forward values
        only — their cotangent is treated as zero, correct solely under
        detached importance sampling; stop_gradient makes that explicit.
        With ``weights_grad=True`` the weights output is differentiable
        too: the backward loads a (B, S) external weights cotangent and
        seeds the compositing VJP with it (one extra f32 operand, ~3 MB
        at the flagship step) — this is what lets weight-space losses
        (DISTORTION_LOSS_MULT) run at megakernel speed instead of
        forcing the XLA train path.
    """
    if bwd_mode not in ("residual", "recompute"):
        raise ValueError(f"unknown bwd_mode: {bwd_mode!r}")
    s = t_vals.shape[-1]
    # Late-bound defaults: the measured per-S table (None) so the engine
    # gets the swept optimum per pass; sweep scripts pass explicit tiles.
    dft_fwd, dft_bwd = _default_tiles(s)
    if max_tile_fwd is None:
        max_tile_fwd = dft_fwd
    if max_tile_bwd is None:
        max_tile_bwd = dft_bwd
    num_layers = len(params["trunk"])
    cdt = jnp.dtype(compute_dtype)
    flat = [
        p.astype(cdt) if p.ndim == 2 else p.reshape(1, -1)
        for p in _flatten_params(params, num_layers)
    ]
    static = (
        num_layers, skip_layer, cdt.name,
        _rays_per_tile(s, max_tile_fwd), _rays_per_tile(s, max_tile_bwd),
        l_xyz, l_dir, bwd_mode, bool(weights_grad),
    )
    rgb, weights = _fused_render_rays(static, origins, directions, t_vals,
                                      *flat)
    if weights_grad:
        return rgb, weights
    return rgb, jax.lax.stop_gradient(weights)


def apply_nerf_render_pallas(
    params: Params,
    x_enc: jnp.ndarray,
    d_enc: jnp.ndarray,
    t_vals: jnp.ndarray,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    skip_layer: int = 4,
    max_tile_fwd: int | None = None,
    max_tile_bwd: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused MLP + alpha compositing over a ray batch.

    Args:
        params: MLP pytree (models/mlp.py layout).
        x_enc: ``(B, S, xyz_dim)`` encoded sample positions.
        d_enc: ``(B, S, dir_dim)`` encoded view directions.
        t_vals: ``(B, S)`` ascending sample distances.

    Returns:
        ``(rgb, weights)``: ``(B, 3)`` composited color (differentiable
        w.r.t. the MLP parameters) and ``(B, S)`` compositing weights
        (forward value only — their cotangent is treated as zero, which is
        correct solely under detached importance sampling).
    """
    b, s = t_vals.shape
    dft_fwd, dft_bwd = _default_tiles(s)
    if max_tile_fwd is None:
        max_tile_fwd = dft_fwd
    if max_tile_bwd is None:
        max_tile_bwd = dft_bwd
    num_layers = len(params["trunk"])
    cdt = jnp.dtype(compute_dtype)
    flat = [
        p.astype(cdt) if p.ndim == 2 else p.reshape(1, -1)
        for p in _flatten_params(params, num_layers)
    ]
    r_fwd = _rays_per_tile(s, max_tile_fwd)
    r_bwd = _rays_per_tile(s, max_tile_bwd)
    static = (num_layers, skip_layer, cdt.name, r_fwd, r_bwd)
    x2 = x_enc.reshape(b * s, -1)
    d2 = d_enc.reshape(b * s, -1)
    rgb, weights = _fused_render(static, x2, d2, t_vals, *flat)
    # The backward computes no weights cotangent (detached importance
    # sampling); make that explicit in the graph so differentiating
    # through `weights` yields stop-gradient semantics rather than
    # silently-wrong values.
    return rgb, jax.lax.stop_gradient(weights)
