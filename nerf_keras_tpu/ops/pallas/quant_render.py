"""int8 inference megakernel: raw rays -> encode -> int8 MLP -> composite.

The forward-only sibling of ops/pallas/fused_render.py's ray megakernel
with the MLP running int8 x int8 -> int32 on the MXU (2x the bf16 rate on
v5e; measured ~1.38x end-to-end with the dequant/relu/requant glue,
scripts/probe_int8_speed.py).  Everything else is shared with the bf16
kernel: in-VMEM sample expansion + Fourier encode (f32 — sin phase error
at the top octave would be catastrophic in lower precision), the exact
blocked selector matmuls, and the alpha-compositing tile.

The int8 MLP body itself lives in ops/quant.py:quant_forward_tile and is
traced verbatim here — the jnp reference path and this kernel run
bit-identical integer pipelines, which is what the parity tests pin.

No backward: quantization is inference-only (training stays bf16).

Reference parity target: the f32 inference path this accelerates is
/root/reference/inference.py:180-268 (chunked forward_pass render).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_keras_tpu.ops.quant import (
    QuantParams,
    flatten_qparams,
    quant_forward_tile,
    quantize_activation,
)
from nerf_keras_tpu.ops.pallas.fused_render import (
    _const_spec,
    _encode_consts,
    _encode_tile,
    _expand_rows,
    _expand_rows_x,
    _from_rs,
    _from_rs_x,
    _pad_ray_batch,
    _ray_specs,
    _rays_per_tile,
    _sel_consts,
    _vmem_cap,
    _volume_render_tile,
)
from nerf_keras_tpu.ops.pallas.fused_mlp import _should_interpret


def _default_tiles_q(s: int) -> int:
    """Measured-optimal forward point-tile budget for the int8 kernel
    (scripts/exp_int8_ab.py --tiles, same-process sweep on v5e at 16384
    rays): coarse (S=64) r=32 like bf16 (12.25/12.34 ms vs 13.40 at r=8);
    fine (S=192) r=8 BEATS the bf16-optimal r=16 (32.73 ms vs 36.48 —
    the int8 glue's extra VPU work pipelines better against smaller
    streamed tiles)."""
    if s <= 96:
        return 32 * s
    return 8 * s


def _fwd_kernel_q(num_layers, skip_layer, r, s, dx, dd,
                  o_ref, d_ref, t_ref, a_ref, at_ref, b_ref,
                  ex_ref, ed_ref, *refs):
    rgb_ref, w_ref = refs[-2], refs[-1]
    qrefs = list(refs[:-2])

    # Expand rays to samples and Fourier-encode positions in f32 (same
    # selector machinery as the bf16 kernel's _expand_encode).
    # EXACT 3-limb movements for encode inputs (see fused_render's
    # precision note: bf16-rounded positions scale by 2^(L-1) into radians
    # of top-octave phase error).
    o_exp = _expand_rows_x(o_ref[:], at_ref)
    d_exp = _expand_rows_x(d_ref[:], at_ref)
    t_flat = _from_rs_x(t_ref[:], at_ref, b_ref)
    points = o_exp + d_exp * t_flat
    x_enc = _encode_tile(points, ex_ref, dx)  # (R*S, xyz) f32

    # Directions: encode + QUANTIZE at ray level (R rows), then expand the
    # small ints through the exact f32 selector — int values <= 127 are
    # exact in f32, so the int8 cast back is lossless and S x fewer
    # quantize ops run than per-sample.
    inv_d = qrefs[-1]
    d_enc_ray = _encode_tile(d_ref[:], ed_ref, dd)      # (R, dir) f32
    qd_ray = quantize_activation(d_enc_ray, inv_d[:])   # (R, dir) int8
    qd = _expand_rows(qd_ray.astype(jnp.float32), at_ref).astype(jnp.int8)

    preds = quant_forward_tile(qrefs, num_layers, skip_layer, x_enc, qd)
    rgb_out, weights, _ = _volume_render_tile(
        preds, t_ref[:], a_ref, b_ref, r, s
    )
    rgb_ref[:] = rgb_out
    w_ref[:] = weights


def render_rays_fused_quant(
    qparams: QuantParams,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_vals: jnp.ndarray,
    *,
    l_xyz: int = 10,
    l_dir: int = 4,
    skip_layer: int = 4,
    max_tile_fwd: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """int8 ray megakernel (forward only).

    Args:
        qparams: one MLP's quantized params (ops/quant.py:quantize_mlp).
        origins/directions: ``(B, 3)`` rays.
        t_vals: ``(B, S)`` ascending sample distances.

    Returns:
        ``(rgb, weights)`` — ``(B, 3)`` / ``(B, S)`` f32, same contract as
        the bf16 ``render_rays_fused`` forward.
    """
    b, s = t_vals.shape
    if max_tile_fwd is None:
        max_tile_fwd = _default_tiles_q(s)
    r_fwd = _rays_per_tile(s, max_tile_fwd)
    b_pad = ((b + r_fwd - 1) // r_fwd) * r_fwd
    grid = b_pad // r_fwd
    tile = r_fwd * s

    num_layers = len(qparams["trunk"])
    flat = flatten_qparams(qparams)
    o2, d2, t2 = _pad_ray_batch(origins, directions, t_vals, b, s, b_pad)
    sel_a, sel_at, sel_b = _sel_consts(s)
    ex, dx = _encode_consts(3, l_xyz)
    ed, dd = _encode_consts(3, l_dir)
    ex, ed = jnp.asarray(ex), jnp.asarray(ed)

    kernel = functools.partial(
        _fwd_kernel_q, num_layers, skip_layer, r_fwd, s, dx, dd
    )
    rgb, weights = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            *_ray_specs(r_fwd, s),
            _const_spec(sel_a),
            _const_spec(sel_at),
            _const_spec(sel_b),
            _const_spec(ex),
            _const_spec(ed),
            *[_const_spec(w) for w in flat],
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
    )(o2, d2, t2, sel_a, sel_at, sel_b, ex, ed, *flat)
    return rgb[:b], weights[:b]
