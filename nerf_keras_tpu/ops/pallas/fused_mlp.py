"""Fused NeRF-MLP Pallas kernel: the whole 8-layer skip-MLP in VMEM.

Why this kernel exists (SURVEY.md §3.3, §7 step 8): the hot loop evaluates a
~0.6M-parameter MLP at every ray sample — ``(B*S, 63)`` encoded points through
eight ``hidden x hidden`` matmuls plus the sigma/feature/rgb heads (reference
models.py:24-62 wired into the forward pass at models.py:151-176).  Left to
XLA, each layer's ``(B*S, 256)`` activation round-trips HBM (at the flagship
batch that is ~800 MB per layer per direction); this kernel instead pins ALL
weights (~1.2 MB bf16) in VMEM, streams ray-sample tiles through the full
layer stack in-register, and writes back only the ``(B*S, 4)`` raw outputs.
Per point the HBM traffic drops from ~100 floats to read-(x_enc,d_enc) +
write-4, turning the op MXU-compute-bound.

Training uses a hand-written backward kernel (``jax.custom_vjp``): it
recomputes the per-tile activations in VMEM (checkpoint-free — recompute is
cheaper than storing (B*S, hidden) residuals in HBM), then walks the layer
stack in reverse, accumulating dW/db across the sequential grid in f32.
Gradients w.r.t. the encoded inputs exist for the reference-faithful mode
where the fine pass's t-values stay differentiable through ``sample_pdf``
(the reference has no stop_gradient there, data_utils.py:172-223); with the
default detached sampling (NeRFConfig.stop_pdf_gradient) nothing consumes
them, and ``need_input_grads=False`` skips their matmuls and HBM writes.

This kernel wins TRAINING only: for forward-only work XLA's automatic
fusion is as fast or faster (see docs/PERF.md), so eval/render use the jnp
path (engine/trainer.py).

Parity: tests/test_pallas.py checks fwd+grad against the jnp path
(models/mlp.py) in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = dict[str, Any]

# Ray-sample tiles per grid step (measured on v5e at hidden 256):
# forward peaks at 2048 (9.25 ms vs 9.59 ms at 512 for 786k points); the
# backward holds all per-layer activations plus f32 dW accumulators in
# VMEM — with input-gradient outputs it overflows the 16 MB scoped budget
# beyond 512, without them (the default training config) 1024 fits and is
# ~3% faster (26.5 vs 27.2 ms for the fine-pass grad).
_TILE_FWD = 2048
_TILE_BWD = 512
_TILE_BWD_NO_INPUT_GRADS = 1024


def _is_skip(i: int, skip_layer: int) -> bool:
    """Layer i's *output* gets the encoded position concatenated back in
    (reference models.py:38-39: ``i % skip_layer == 0 and i > 0``)."""
    return i % skip_layer == 0 and i > 0


def _flatten_params(params: Params, num_layers: int) -> list[jnp.ndarray]:
    """Deterministic flat ordering of the MLP pytree for pallas_call args.

    The feature and sigma heads are merged into one ``(in, hidden+1)``
    "fs" weight/bias pair OUTSIDE the kernel (autodiff splits the merged
    cotangent back through the concatenate): both heads read the same
    ``x_last``, and N=257 pads to the same 384 MXU columns as the separate
    N=256 + N=1 dots — one invocation instead of two in the forward AND
    one dW accumulator instead of two in the backward, for free.
    """
    flat: list[jnp.ndarray] = []
    for i in range(num_layers):
        layer = params["trunk"][i]
        flat += [layer["w"], layer["b"]]
    flat += [
        jnp.concatenate([params["feature"]["w"], params["sigma"]["w"]], axis=-1),
        jnp.concatenate([params["feature"]["b"], params["sigma"]["b"]], axis=-1),
    ]
    for head in ("branch", "rgb"):
        flat += [params[head]["w"], params[head]["b"]]
    return flat


# Flat params per MLP: 2 per trunk layer + fs/branch/rgb w+b pairs.
def _n_flat(num_layers: int) -> int:
    return 2 * num_layers + 6


def _mlp_precision(compute_dtype):
    """HIGHEST for f32 configs (Mosaic would silently one-pass-bf16
    truncate them at DEFAULT), DEFAULT for bf16 (native MXU input)."""
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(compute_dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _forward_tile(wr, x_enc, d_enc, num_layers, skip_layer, compute_dtype):
    """Evaluate the full MLP on one (T, xyz) tile; returns (T, 4) f32 preds
    and the per-layer inputs (for the backward's recompute).

    Mirrors models/mlp.py:apply_nerf_mlp exactly (minus BatchNorm, which the
    Pallas path does not support — config validation rejects the combo).
    """
    # COMPUTE_DTYPE=float32 must mean true f32: Mosaic (like XLA-TPU)
    # one-pass-bf16-truncates f32 dot operands at DEFAULT precision, so
    # the parity dtype pins HIGHEST (same rule as models/mlp._dense).
    # bf16 operands are the MXU's native input — precision is moot there.
    prec = _mlp_precision(compute_dtype)
    hidden = wr[0].shape[1]
    acts = []  # input to each trunk layer, in compute dtype
    x = x_enc.astype(compute_dtype)
    x_skip = x
    for i in range(num_layers):
        w, b = wr[2 * i], wr[2 * i + 1]
        acts.append(x)
        h = jnp.dot(x, w[:], preferred_element_type=jnp.float32,
                    precision=prec) + b[:]
        h = jnp.maximum(h, 0.0).astype(compute_dtype)
        if _is_skip(i, skip_layer):
            x = jnp.concatenate([h, x_skip], axis=-1)
        else:
            x = h
    base = 2 * num_layers
    w_fs, b_fs = wr[base], wr[base + 1]
    w_br, b_br = wr[base + 2], wr[base + 3]
    w_rgb, b_rgb = wr[base + 4], wr[base + 5]

    # Merged feature+sigma head (see _flatten_params): columns [:hidden]
    # are the feature layer, column [hidden] is sigma.
    fs = jnp.dot(x, w_fs[:], preferred_element_type=jnp.float32,
                 precision=prec) + b_fs[:]
    feat = fs[:, :hidden]
    sigma = fs[:, hidden:]
    fd = jnp.concatenate(
        [feat.astype(compute_dtype), d_enc.astype(compute_dtype)], axis=-1
    )
    h2 = jnp.dot(fd, w_br[:], preferred_element_type=jnp.float32,
                 precision=prec) + b_br[:]
    h2 = jnp.maximum(h2, 0.0).astype(compute_dtype)
    rgb = jnp.dot(h2, w_rgb[:], preferred_element_type=jnp.float32,
                  precision=prec) + b_rgb[:]
    preds = jnp.concatenate([rgb, sigma], axis=-1)
    return preds, (acts, x, fd, h2)


def _fwd_kernel(num_layers, skip_layer, compute_dtype, x_ref, d_ref, *refs):
    out_ref = refs[-1]
    wr = refs[:-1]
    preds, _ = _forward_tile(
        wr, x_ref[:], d_ref[:], num_layers, skip_layer, compute_dtype
    )
    out_ref[:] = preds


def _relu_mask(h):
    """1.0 where h > 0.  Compare in f32 — the v5e VPU has no bf16
    vector compare (Mosaic: 'Target does not support this comparison')."""
    return (h.astype(jnp.float32) > 0.0).astype(jnp.float32)


def _mlp_bwd_tile(
    wr, dw_refs, res, g, num_layers, skip_layer, compute_dtype, hidden,
    need_input_grads,
):
    """Reverse walk of the MLP for one tile given upstream grads ``g``
    (T, 4) and the forward intermediates ``res`` from :func:`_forward_tile`.

    Accumulates dW/db into ``dw_refs`` (VMEM-resident f32 blocks, same
    order as :func:`_flatten_params`); returns ``(dx_enc, dd_enc)`` f32 or
    ``(None, None)`` when ``need_input_grads`` is False (their matmuls are
    skipped entirely).  Shared by the plain MLP backward kernel and the
    fused MLP+volume-render backward kernel.
    """
    (acts, x_last, fd, h2) = res
    drgb = g[:, :3]
    dsigma = g[:, 3:4]

    base = 2 * num_layers
    w_fs = wr[base]
    w_br = wr[base + 2]
    w_rgb = wr[base + 4]

    prec = _mlp_precision(compute_dtype)

    def matmul_nt(a, b):
        """a @ b.T with f32 accumulation: (T, n) x (m, n) -> (T, m)."""
        return jax.lax.dot_general(
            a.astype(compute_dtype), b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    def matmul_tn(a, b):
        """a.T @ b with f32 accumulation: (T, m) x (T, n) -> (m, n)."""
        return jax.lax.dot_general(
            a.astype(compute_dtype), b.astype(compute_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    def bsum(v):
        return jnp.sum(v, axis=0, keepdims=True)

    # Map flat param index -> dw ref (same ordering as _flatten_params).
    def dw(i):
        return dw_refs[i]

    dw(base + 4)[:] += matmul_tn(h2, drgb)
    dw(base + 5)[:] += bsum(drgb)
    dh2 = matmul_nt(drgb, w_rgb[:]) * _relu_mask(h2)

    # branch: h2 = relu(fd @ w_br + b_br)
    dw(base + 2)[:] += matmul_tn(fd, dh2)
    dw(base + 3)[:] += bsum(dh2)
    dfd = matmul_nt(dh2, w_br[:])

    dfeat = dfd[:, :hidden]
    dd_enc = dfd[:, hidden:] if need_input_grads else None

    # Merged feature+sigma head backward: the params arrive pre-merged
    # (_flatten_params), so dW, db and dx each ride ONE MXU pass.
    dfs = jnp.concatenate([dfeat, dsigma], axis=-1)
    dw(base)[:] += matmul_tn(x_last, dfs)
    dw(base + 1)[:] += bsum(dfs)
    dx = matmul_nt(dfs, w_fs[:])

    dx_enc_acc = None
    for i in reversed(range(num_layers)):
        if _is_skip(i, skip_layer):
            dh = dx[:, :hidden]
            if need_input_grads:
                skip_part = dx[:, hidden:]
                dx_enc_acc = (
                    skip_part if dx_enc_acc is None else dx_enc_acc + skip_part
                )
        else:
            dh = dx
        # h_i = relu(acts[i] @ w_i + b_i); recover the relu output from the
        # *next* layer's stored input (h is its prefix for skip layers).
        if i + 1 < num_layers:
            h_i = acts[i + 1][:, :hidden]
        else:
            h_i = x_last[:, :hidden]
        dpre = dh * _relu_mask(h_i)
        dw(2 * i)[:] += matmul_tn(acts[i], dpre)
        dw(2 * i + 1)[:] += bsum(dpre)
        if i > 0 or need_input_grads:
            dx = matmul_nt(dpre, wr[2 * i][:])

    if not need_input_grads:
        return None, None
    dx_enc = dx if dx_enc_acc is None else dx_enc_acc + dx
    return dx_enc, dd_enc


def _bwd_kernel(
    num_layers, skip_layer, compute_dtype, hidden, xyz_dim, need_input_grads,
    x_ref, d_ref, g_ref, *refs,
):
    """Recompute-forward + reverse walk for one tile.

    Outputs (after the weight refs): dx, dd (per-tile, only when
    ``need_input_grads`` — with the default stop_pdf_gradient training
    config nothing consumes input gradients, so their matmuls and HBM
    writes are skipped entirely), then dW/db per parameter with constant
    index maps — those blocks live in VMEM across the whole sequential
    grid and accumulate in f32.
    """
    n_w = _n_flat(num_layers)
    wr = refs[:n_w]
    if need_input_grads:
        dx_ref, dd_ref = refs[n_w], refs[n_w + 1]
        dw_refs = refs[n_w + 2:]
    else:
        dx_ref = dd_ref = None
        dw_refs = refs[n_w:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs:
            r[:] = jnp.zeros(r.shape, r.dtype)

    _, res = _forward_tile(
        wr, x_ref[:], d_ref[:], num_layers, skip_layer, compute_dtype
    )
    g = g_ref[:].astype(jnp.float32)
    dx_enc, dd_enc = _mlp_bwd_tile(
        wr, dw_refs, res, g, num_layers, skip_layer, compute_dtype, hidden,
        need_input_grads,
    )
    if need_input_grads:
        dx_ref[:] = dx_enc.astype(dx_ref.dtype)
        dd_ref[:] = dd_enc.astype(dd_ref.dtype)


def _pad_rows(a: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    if n_pad == a.shape[0]:
        return a
    return jnp.pad(a, ((0, n_pad - a.shape[0]), (0, 0)))


def _should_interpret() -> bool:
    """Interpret-mode fallback so the kernel runs in CPU tests."""
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_mlp(static, x_enc, d_enc, *flat_params):
    return _fused_mlp_fwd_impl(static, x_enc, d_enc, flat_params)


def _fused_mlp_fwd_impl(static, x_enc, d_enc, flat_params):
    num_layers, skip_layer, compute_dtype_name, tile, _, _ = static
    compute_dtype = jnp.dtype(compute_dtype_name)
    n = x_enc.shape[0]
    n_pad = ((n + tile - 1) // tile) * tile
    grid = n_pad // tile

    wspecs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in flat_params
    ]
    kernel = functools.partial(
        _fwd_kernel, num_layers, skip_layer, compute_dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, x_enc.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d_enc.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        interpret=_should_interpret(),
    )(_pad_rows(x_enc, n_pad), _pad_rows(d_enc, n_pad), *flat_params)
    return out[:n]


def _fused_mlp_fwd(static, x_enc, d_enc, *flat_params):
    out = _fused_mlp_fwd_impl(static, x_enc, d_enc, flat_params)
    return out, (x_enc, d_enc, flat_params)


def _fused_mlp_bwd(static, residuals, g):
    num_layers, skip_layer, compute_dtype_name, _, tile, need_input_grads = static
    compute_dtype = jnp.dtype(compute_dtype_name)
    x_enc, d_enc, flat_params = residuals
    n = x_enc.shape[0]
    n_pad = ((n + tile - 1) // tile) * tile
    grid = n_pad // tile
    hidden = flat_params[0].shape[1]
    xyz_dim = x_enc.shape[1]

    wspecs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in flat_params
    ]
    # All flat params are 2D here (biases arrive as (1, dim) rows).
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat_params]
    dw_specs = [
        pl.BlockSpec(s.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for s in dw_shapes
    ]

    kernel = functools.partial(
        _bwd_kernel, num_layers, skip_layer, compute_dtype, hidden, xyz_dim,
        need_input_grads,
    )
    if need_input_grads:
        # dx/dd cotangents match the (possibly bf16) encoding primals.
        grad_specs = [
            pl.BlockSpec((tile, xyz_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d_enc.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        grad_shapes = [
            jax.ShapeDtypeStruct((n_pad, xyz_dim), x_enc.dtype),
            jax.ShapeDtypeStruct((n_pad, d_enc.shape[1]), d_enc.dtype),
        ]
    else:
        grad_specs, grad_shapes = [], []

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, xyz_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d_enc.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=[*grad_specs, *dw_specs],
        out_shape=[*grad_shapes, *dw_shapes],
        interpret=_should_interpret(),
    )(
        _pad_rows(x_enc, n_pad),
        _pad_rows(d_enc, n_pad),
        _pad_rows(g, n_pad),
        *flat_params,
    )
    if need_input_grads:
        dx, dd = outs[0][:n], outs[1][:n]
        dw_outs = outs[2:]
    else:
        dx, dd = jnp.zeros_like(x_enc), jnp.zeros_like(d_enc)
        dw_outs = outs
    # Cotangent dtypes must match the primals: dW accumulates in f32 inside
    # the kernel, the weight primals may be bf16 (cast upstream converts
    # these back to f32 for the optimizer).
    dws = [dv.astype(w.dtype) for w, dv in zip(flat_params, dw_outs)]
    return (dx, dd, *dws)


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def apply_nerf_mlp_pallas(
    params: Params,
    x_enc: jnp.ndarray,
    d_enc: jnp.ndarray,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    skip_layer: int = 4,
    tile: int = _TILE_FWD,
    bwd_tile: int | None = None,
    need_input_grads: bool = True,
) -> jnp.ndarray:
    """Drop-in fused replacement for models/mlp.py:apply_nerf_mlp.

    Flattens any leading batch shape to (N, feat), pads N to the tile size,
    runs the fused kernel, and restores the shape.  Returns raw f32
    ``(..., 4)`` ``[rgb_logits, sigma]`` like the jnp path.

    ``need_input_grads=False`` makes the backward return zeros for the
    encoding cotangents and skip their computation in-kernel — correct
    whenever nothing differentiable feeds the encodings (the default
    ``stop_pdf_gradient`` training config).
    """
    num_layers = len(params["trunk"])
    lead = x_enc.shape[:-1]
    x2 = x_enc.reshape(-1, x_enc.shape[-1])
    d2 = d_enc.reshape(-1, d_enc.shape[-1])
    # Weight matrices are pre-cast to the compute dtype OUTSIDE the kernel:
    # a mixed bf16 x f32 jnp.dot inside would silently promote to an f32
    # matmul (1/8 MXU rate on v5e) — measured 39 ms vs 6 ms for the fine
    # pass.  Biases stay f32 (added after the f32-accumulated dot); the
    # cast is outside custom_vjp so autodiff converts the bf16 weight
    # grads from the backward kernel to f32 automatically.
    # Biases go in as (1, dim) rows — TPU VMEM wants >= 2D operands.
    cdt = jnp.dtype(compute_dtype)
    flat = [
        p.astype(cdt) if p.ndim == 2 else p.reshape(1, -1)
        for p in _flatten_params(params, num_layers)
    ]
    if bwd_tile is None:
        bwd_tile = _TILE_BWD if need_input_grads else _TILE_BWD_NO_INPUT_GRADS
    static = (
        num_layers, skip_layer, jnp.dtype(compute_dtype).name, tile,
        bwd_tile, bool(need_input_grads),
    )
    out = _fused_mlp(static, x2, d2, *flat)
    return out.reshape(*lead, 4)
