"""Post-training int8 quantization for NeRF MLP *inference*.

Beyond-reference capability (the reference has no quantization anywhere;
its inference path is f32 keras — /root/reference/inference.py:180-268).
On TPU v5e the MXU runs int8 x int8 -> int32 at 394 TOPS vs 197 TFLOP/s
bf16; with full dequant/relu/requant glue the measured kernel gain is
~1.38x (scripts/probe_int8_speed.py), worth ~15-20% of an 800x800 frame.

Scheme — designed so the NeRF skip-concat needs NO special casing:

* **Activations**: symmetric int8 with CALIBRATED, static, PER-COLUMN
  scales.  Each matmul operand column c is quantized as
  ``q = round(x * 127 / cal[c])`` where ``cal`` is the column abs-max
  over a calibration batch.  Per-column matters: the encoded-position
  operand mixes raw xyz (magnitude ~ scene bounds) with sin/cos features
  in [-1, 1] — a per-tensor scale would crush the latter's resolution.
* **Weights**: the per-column input scales are FOLDED into the weight
  rows before weight quantization: ``V[k, j] = cal_in[k]/127 * W[k, j]``
  is quantized per OUTPUT channel j (``s[j] = max_k |V[k, j]| / 127``,
  ``Wq = round(V / s)``).  The integer product then dequantizes with a
  single per-output row multiply: ``y = acc_int32 * s + b``.
* **Skip concat / branch concat**: concatenated operands (``[h4 |
  x_enc]``, ``[feat | d_enc]``) carry heterogeneous scales per column —
  exactly what the per-row folding absorbs.  The int8 tensors are
  concatenated as-is and ride ONE int8 matmul; no rescaling pass.

The quantized forward is defined ONCE (:func:`quantize_activation`,
:func:`_qdot` glue) and traced by BOTH the jnp reference path
(:func:`apply_nerf_mlp_quant`, used for tests and the XLA fallback) and
the Pallas megakernel (ops/pallas/quant_render.py) — so kernel parity
tests compare bit-identical integer pipelines.

Accuracy gate: callers should verify the quantized render against the
float render (PSNR) before serving — ``cli/infer.py --quant int8`` does
this automatically (``--quant-gate-db``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from nerf_keras_tpu.ops.encoding import encode_position
from nerf_keras_tpu.ops.rays import sample_rays
from nerf_keras_tpu.ops.sampling import generate_t_vals, sample_pdf, sorted_union
from nerf_keras_tpu.ops.volume import volume_render

QMAX = 127.0
# Dead-channel floor for calibrated abs-maxes: a column that never fires in
# calibration (relu-dead unit) would otherwise yield a 0 scale and NaNs.
_CAL_FLOOR = 1e-8

QuantParams = dict[str, Any]


def _is_skip(i: int, skip_layer: int) -> bool:
    """Trunk layer i's output gets the encoded position concatenated back
    in (reference models.py:38-39: ``i % skip_layer == 0 and i > 0``)."""
    return i % skip_layer == 0 and i > 0


def quantize_activation(x: jnp.ndarray, inv_scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric int8 quantization: ``round(x * inv_scale)`` clipped to
    [-127, 127].  ``inv_scale`` is a (1, dim) row of ``127 / cal`` values.

    Uses ``jnp.round`` (round-to-nearest-even) — verified to lower
    exactly in compiled Mosaic (scripts/probe_quant_ops.py), so the jnp
    and Pallas paths are bit-identical.
    """
    q = jnp.clip(jnp.round(x * inv_scale), -QMAX, QMAX)
    return q.astype(jnp.int8)


def _qdot(a: jnp.ndarray, wq: jnp.ndarray) -> jnp.ndarray:
    """int8 x int8 -> int32 matmul (2x MXU rate vs bf16 on v5e)."""
    return jax.lax.dot_general(
        a, wq,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _dense_f32(x: jnp.ndarray, layer: dict) -> jnp.ndarray:
    """Calibration-path dense in true f32.  HIGHEST precision: TPU f32
    dots otherwise run bf16-truncated operands (CLAUDE.md), which would
    perturb the calibrated ranges."""
    return jnp.dot(
        x, layer["w"],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + layer["b"]


def _col_absmax(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1)))


def mlp_calibration_absmax(
    params: dict,
    x_enc: jnp.ndarray,
    d_enc: jnp.ndarray,
    skip_layer: int = 4,
) -> dict:
    """Per-column abs-max of every quantized matmul operand for ONE MLP.

    Runs the f32 forward (no BatchNorm variant — config validation keeps
    quantization off BN models) capturing the operands that will be int8
    at inference: the encoded position/direction, each trunk layer's
    post-relu output, the (linear, signed) feature-head output and the
    branch layer's post-relu output.

    Returns ``{'x_enc': (xyz,), 'd_enc': (dir,), 'h': [(hidden,)] * L,
    'feat': (hidden,), 'h2': (hidden//2,)}`` f32 vectors.  Chunked
    calibration: fold several calls together with :func:`merge_absmax`.
    """
    x_enc = x_enc.reshape(-1, x_enc.shape[-1]).astype(jnp.float32)
    d_enc = d_enc.reshape(-1, d_enc.shape[-1]).astype(jnp.float32)
    stats = {"x_enc": _col_absmax(x_enc), "d_enc": _col_absmax(d_enc)}
    x = x_enc
    x_skip = x_enc
    h_stats = []
    for i, layer in enumerate(params["trunk"]):
        h = jnp.maximum(_dense_f32(x, layer), 0.0)
        h_stats.append(_col_absmax(h))
        x = jnp.concatenate([h, x_skip], axis=-1) if _is_skip(i, skip_layer) else h
    stats["h"] = h_stats
    feat = _dense_f32(x, params["feature"])
    stats["feat"] = _col_absmax(feat)
    fd = jnp.concatenate([feat, d_enc], axis=-1)
    h2 = jnp.maximum(_dense_f32(fd, params["branch"]), 0.0)
    stats["h2"] = _col_absmax(h2)
    return stats


def merge_absmax(a: dict, b: dict) -> dict:
    """Elementwise max of two calibration-stat pytrees (chunked calib)."""
    return jax.tree_util.tree_map(jnp.maximum, a, b)


def _floor_cal(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(c, _CAL_FLOOR)


def _quantize_dense(w: jnp.ndarray, b: jnp.ndarray, cal_in: jnp.ndarray) -> dict:
    """Fold per-column input scales into the rows, then quantize per
    output channel.  ``y = (q_in @ wq).astype(f32) * scale + b`` is the
    dequantized output."""
    v = w.astype(jnp.float32) * (_floor_cal(cal_in)[:, None] / QMAX)
    s = jnp.maximum(jnp.max(jnp.abs(v), axis=0), _CAL_FLOOR) / QMAX
    wq = jnp.clip(jnp.round(v / s), -QMAX, QMAX).astype(jnp.int8)
    return {
        "wq": wq,
        "scale": s.reshape(1, -1).astype(jnp.float32),
        "b": b.reshape(1, -1).astype(jnp.float32),
    }


def _inv_row(cal: jnp.ndarray) -> jnp.ndarray:
    return (QMAX / _floor_cal(cal)).reshape(1, -1).astype(jnp.float32)


def quantize_mlp(params: dict, stats: dict, skip_layer: int = 4) -> QuantParams:
    """Build int8 inference parameters for one NeRF MLP.

    The feature and sigma heads are merged into one "fs" dense — same
    trick as the bf16 kernel (ops/pallas/fused_mlp.py:_flatten_params):
    both read ``x_last`` and N=257 pads to the same MXU columns.

    Returns a pytree of int8 weights, f32 dequant-scale rows, f32 bias
    rows and f32 requant (``127/cal``) rows.
    """
    num_layers = len(params["trunk"])
    cal_x, cal_d = stats["x_enc"], stats["d_enc"]
    qp: QuantParams = {"inv_x": _inv_row(cal_x), "inv_d": _inv_row(cal_d)}

    trunk = []
    inv_h = []
    for i, layer in enumerate(params["trunk"]):
        if i == 0:
            cal_in = cal_x
        elif _is_skip(i - 1, skip_layer):
            cal_in = jnp.concatenate([stats["h"][i - 1], cal_x])
        else:
            cal_in = stats["h"][i - 1]
        trunk.append(_quantize_dense(layer["w"], layer["b"], cal_in))
        inv_h.append(_inv_row(stats["h"][i]))
    qp["trunk"] = trunk
    qp["inv_h"] = inv_h

    last = num_layers - 1
    cal_last = (
        jnp.concatenate([stats["h"][last], cal_x])
        if _is_skip(last, skip_layer)
        else stats["h"][last]
    )
    w_fs = jnp.concatenate([params["feature"]["w"], params["sigma"]["w"]], axis=-1)
    b_fs = jnp.concatenate([params["feature"]["b"], params["sigma"]["b"]], axis=-1)
    qp["fs"] = _quantize_dense(w_fs, b_fs, cal_last)
    qp["inv_feat"] = _inv_row(stats["feat"])

    cal_fd = jnp.concatenate([stats["feat"], cal_d])
    qp["branch"] = _quantize_dense(
        params["branch"]["w"], params["branch"]["b"], cal_fd
    )
    qp["inv_h2"] = _inv_row(stats["h2"])
    qp["rgb"] = _quantize_dense(params["rgb"]["w"], params["rgb"]["b"], stats["h2"])
    return qp


def quant_forward_tile(
    qp_flat: list,
    num_layers: int,
    skip_layer: int,
    x_enc: jnp.ndarray,
    qd: jnp.ndarray,
) -> jnp.ndarray:
    """The int8 MLP on one (T, xyz) f32 tile + pre-quantized (T, dir)
    int8 directions; returns (T, 4) f32 ``[rgb_logits, sigma]``.

    Takes the FLAT parameter list (:func:`flatten_qparams` order) and
    indexes positionally, so the same function body runs under jnp (lists
    of arrays) and inside the Pallas kernel (lists of VMEM refs) — see
    :func:`_reader`.
    """
    r = _reader(qp_flat)
    idx = _QPIdx(num_layers)
    hidden = r(idx.trunk_wq(0)).shape[1]

    qx = quantize_activation(x_enc, r(idx.inv_x))
    x = qx
    x_skip = qx
    for i in range(num_layers):
        y = (
            _qdot(x, r(idx.trunk_wq(i))).astype(jnp.float32)
            * r(idx.trunk_scale(i))
            + r(idx.trunk_b(i))
        )
        h = jnp.maximum(y, 0.0)
        hq = quantize_activation(h, r(idx.inv_h(i)))
        if _is_skip(i, skip_layer):
            x = jnp.concatenate([hq, x_skip], axis=-1)
        else:
            x = hq

    fs = (
        _qdot(x, r(idx.fs_wq)).astype(jnp.float32) * r(idx.fs_scale)
        + r(idx.fs_b)
    )
    feat, sigma = fs[:, :hidden], fs[:, hidden:]
    qfeat = quantize_activation(feat, r(idx.inv_feat))
    fd = jnp.concatenate([qfeat, qd], axis=-1)
    h2 = jnp.maximum(
        _qdot(fd, r(idx.br_wq)).astype(jnp.float32) * r(idx.br_scale)
        + r(idx.br_b),
        0.0,
    )
    qh2 = quantize_activation(h2, r(idx.inv_h2))
    rgb = (
        _qdot(qh2, r(idx.rgb_wq)).astype(jnp.float32) * r(idx.rgb_scale)
        + r(idx.rgb_b)
    )
    return jnp.concatenate([rgb, sigma], axis=-1)


def _reader(flat):
    """Read element i of a flat param list that may hold arrays (jnp path)
    or VMEM refs (Pallas path).  ``[:]`` materializes a ref's block and is
    an identity slice on an array/tracer, so one spelling serves both."""
    def read(i):
        return flat[i][:]
    return read


class _QPIdx:
    """Positional layout of :func:`flatten_qparams`: per trunk layer
    (wq, scale, b, inv_h), then fs (wq, scale, b) + inv_feat, branch
    (wq, scale, b) + inv_h2, rgb (wq, scale, b), inv_x, inv_d."""

    def __init__(self, num_layers: int):
        self._l = num_layers
        base = 4 * num_layers
        self.fs_wq, self.fs_scale, self.fs_b = base, base + 1, base + 2
        self.inv_feat = base + 3
        self.br_wq, self.br_scale, self.br_b = base + 4, base + 5, base + 6
        self.inv_h2 = base + 7
        self.rgb_wq, self.rgb_scale, self.rgb_b = base + 8, base + 9, base + 10
        self.inv_x = base + 11
        self.inv_d = base + 12

    def trunk_wq(self, i):
        return 4 * i

    def trunk_scale(self, i):
        return 4 * i + 1

    def trunk_b(self, i):
        return 4 * i + 2

    def inv_h(self, i):
        return 4 * i + 3


def n_flat_qparams(num_layers: int) -> int:
    return 4 * num_layers + 13


def flatten_qparams(qp: QuantParams) -> list[jnp.ndarray]:
    """Deterministic flat ordering for pallas_call args (see _QPIdx)."""
    flat: list[jnp.ndarray] = []
    for i, lyr in enumerate(qp["trunk"]):
        flat += [lyr["wq"], lyr["scale"], lyr["b"], qp["inv_h"][i]]
    flat += [qp["fs"]["wq"], qp["fs"]["scale"], qp["fs"]["b"], qp["inv_feat"]]
    flat += [qp["branch"]["wq"], qp["branch"]["scale"], qp["branch"]["b"],
             qp["inv_h2"]]
    flat += [qp["rgb"]["wq"], qp["rgb"]["scale"], qp["rgb"]["b"]]
    flat += [qp["inv_x"], qp["inv_d"]]
    return flat


def apply_nerf_mlp_quant(
    qp: QuantParams,
    x_enc: jnp.ndarray,
    d_enc: jnp.ndarray,
    skip_layer: int = 4,
) -> jnp.ndarray:
    """jnp reference / XLA-fallback int8 forward: bit-identical integer
    pipeline to the Pallas quant megakernel.  Returns (..., 4) f32."""
    num_layers = len(qp["trunk"])
    lead = x_enc.shape[:-1]
    x2 = x_enc.reshape(-1, x_enc.shape[-1]).astype(jnp.float32)
    d2 = d_enc.reshape(-1, d_enc.shape[-1]).astype(jnp.float32)
    flat = flatten_qparams(qp)
    qd = quantize_activation(d2, qp["inv_d"])
    preds = quant_forward_tile(flat, num_layers, skip_layer, x2, qd)
    return preds.reshape(*lead, 4)


def calibrate_render(
    params: dict,
    cfg,
    near: float,
    far: float,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
) -> dict:
    """Calibration stats for the coarse AND fine MLPs along real rays.

    Mirrors the deterministic eval pipeline (engine/step.py
    make_render_fn: centered t-values, midpoint inverse-CDF draws) so the
    calibrated ranges cover exactly the activations inference will see:
    the fine pass is calibrated at the t-union produced by the FLOAT
    coarse pass — scale targets, not exactness, so the small coarse drift
    under int8 is immaterial.

    ``origins``/``directions``: (N, 3) calibration rays — a few thousand
    rays from a representative pose suffice (scales are abs-maxes).
    Returns ``{'coarse': stats, 'fine': stats}``.
    """
    origins = jnp.asarray(origins, jnp.float32)
    directions = jnp.asarray(directions, jnp.float32)
    t_vals = generate_t_vals(
        None, near, far, origins.shape[:-1], cfg.ns_coarse, "center"
    )
    points, dirs = sample_rays(origins, directions, t_vals)
    x_enc = encode_position(points, cfg.l_xyz)
    d_enc = encode_position(dirs, cfg.l_dir)
    stats_c = mlp_calibration_absmax(
        params["coarse"], x_enc, d_enc, cfg.skip_layer
    )

    # Float coarse pass -> importance-sampled fine t-values.
    from nerf_keras_tpu.models.mlp import apply_nerf_mlp

    preds_c = apply_nerf_mlp(
        params["coarse"], x_enc, d_enc,
        compute_dtype=jnp.float32, skip_layer=cfg.skip_layer,
    )[0]
    _, _, weights_c = volume_render(preds_c, t_vals)
    t_mid = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
    t_fine = sample_pdf(None, t_mid, weights_c, cfg.ns_fine, deterministic=True)
    t_all = sorted_union(t_vals, t_fine)

    points_f, dirs_f = sample_rays(origins, directions, t_all)
    xf_enc = encode_position(points_f, cfg.l_xyz)
    df_enc = encode_position(dirs_f, cfg.l_dir)
    stats_f = mlp_calibration_absmax(
        params["fine"], xf_enc, df_enc, cfg.skip_layer
    )
    return {"coarse": stats_c, "fine": stats_f}


def calibrate_render_proposal(
    params: dict,
    cfg,
    near: float,
    far: float,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
) -> dict:
    """Calibration stats for a PROPOSAL-trained model (train_sampler=
    'proposal'): there is no coarse MLP — fine activations are calibrated
    at the t-union the float proposal net places, mirroring the online
    render pipeline (engine/step.py make_render_fn proposal branch).
    The proposal net itself stays float: its ~60x-smaller matmuls are not
    worth quantizing.  Returns ``{'fine': stats}``.
    """
    from nerf_keras_tpu.ops.proposal import make_chain_sampler

    origins = jnp.asarray(origins, jnp.float32)
    directions = jnp.asarray(directions, jnp.float32)
    t_vals = generate_t_vals(
        None, near, far, origins.shape[:-1], cfg.ns_coarse, "center"
    )
    chain = make_chain_sampler(
        cfg, cfg.prop_l_xyz, cfg.prop_union, cfg.prop_levels,
        cfg.prop_samples, train=False,
    )
    t_all, _ = chain(params["proposal"], origins, directions, t_vals,
                     None, None)

    points_f, dirs_f = sample_rays(origins, directions, t_all)
    xf_enc = encode_position(points_f, cfg.l_xyz)
    df_enc = encode_position(dirs_f, cfg.l_dir)
    return {
        "fine": mlp_calibration_absmax(
            params["fine"], xf_enc, df_enc, cfg.skip_layer
        )
    }


def quantize_render_params(params: dict, stats: dict, skip_layer: int = 4) -> dict:
    """Quantize the models present in the :func:`calibrate_render` /
    :func:`calibrate_render_proposal` stats (coarse+fine, or fine only
    for proposal-trained checkpoints)."""
    return {
        name: quantize_mlp(params[name], stats[name], skip_layer)
        for name in stats
    }
