"""Functional training core: forward pass, train step, eval step.

Replaces the reference's Keras ``NeRFTrainer`` subclass (models.py:64-225)
with pure functions:

* the full coarse→fine pipeline of ``NeRFTrainer.forward_pass``
  (models.py:151-176) — sample points, Fourier-encode, coarse MLP, volume
  render, inverse-CDF importance sampling, sorted union of t-values, fine
  MLP, second volume render — expressed as one traced function XLA fuses
  end-to-end;
* ``train_step`` mirrors models.py:88-120: loss = MSE(img, rgb_coarse) +
  MSE(img, rgb_fine), one Adam update over both MLPs' params jointly, and
  the same three metrics (loss_coarse / loss / psnr);
* t-values are drawn *inside* the step from an explicit PRNG key —
  per-step stratified sampling instead of the reference's dataset-frozen
  jitter (data_utils.py:156), a documented behavioral improvement
  (SURVEY.md §7) with a reference-faithful 'shared' mode for parity runs.

Everything below is shape-static and jit-compiled once per config.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from nerf_keras_tpu.config import NeRFConfig
from nerf_keras_tpu.models.mlp import apply_nerf_mlp, init_bn_state, init_nerf_params
from nerf_keras_tpu.ops.freq_anneal import fold_train_params
from nerf_keras_tpu.ops.proposal import make_chain_sampler as _make_chain_sampler
from nerf_keras_tpu.ops import (
    composite_background,
    distortion_loss,
    encode_position,
    generate_t_vals,
    sample_pdf,
    sample_rays,
    sorted_union,
    volume_render,
)


class TrainState(NamedTuple):
    """Replicable/shardable training state pytree.

    Unlike the reference (weights-only ``.weights.h5``, no optimizer state,
    no step counter — SURVEY.md §5 checkpoint row), this carries everything
    needed for true resume.
    """

    params: dict  # {'coarse': mlp_params, 'fine': mlp_params}
    bn: dict | None  # {'coarse': bn_state, 'fine': bn_state} or None
    opt_state: Any
    step: jnp.ndarray  # scalar int32
    ema: dict | None = None  # EMA shadow of params (cfg.ema_decay > 0);
    #   updated each train step, consumed by every eval/render path
    #   (Trainer._eval_state).  Last field with a default so existing
    #   positional constructions and pre-EMA checkpoints stay valid.


def make_optimizer(cfg: NeRFConfig) -> optax.GradientTransformation:
    """Adam with Keras-default epsilon=1e-7 (reference train_lego.py:149).

    With ``cfg.lr_final`` set, the LR follows an exponential decay from
    ``learning_rate`` to ``lr_final`` over ``lr_decay_steps`` optimizer
    steps (then stays at the floor) — the original NeRF's lrate schedule,
    absent from the reference (it trains its whole run at the Keras
    default constant LR, train_lego.py:149).  The schedule reads Adam's
    own step count, so checkpoint resume continues the decay correctly.
    """
    if cfg.lr_final is None:
        return optax.adam(cfg.learning_rate, eps=1e-7)
    if cfg.lr_decay_steps <= 0:
        raise ValueError(
            "LR_FINAL is set but LR_DECAY_STEPS is unresolved (0): the "
            "train CLI fills it with epochs * steps-per-epoch; direct "
            "callers must pass an explicit positive horizon"
        )
    schedule = optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=cfg.lr_decay_steps,
        decay_rate=cfg.lr_final / cfg.learning_rate,
        end_value=cfg.lr_final,
    )
    return optax.adam(schedule, eps=1e-7)


def init_train_state(key: jax.Array, cfg: NeRFConfig) -> TrainState:
    """Initialize coarse+fine MLPs (two independent instances, as the
    reference builds at train_lego.py:115-134) plus Adam state.

    With ``cfg.train_sampler == 'proposal'`` the coarse MLP is replaced
    by the tiny proposal net (``{'proposal': ..., 'fine': ...}`` — online
    Mip-NeRF-360-style training, beyond-reference; config docstring)."""
    k_coarse, k_fine = jax.random.split(key)
    kwargs = dict(
        num_layers=cfg.num_layers,
        hidden_dim=cfg.hidden_dim,
        skip_layer=cfg.skip_layer,
        l_xyz=cfg.l_xyz,
        l_dir=cfg.l_dir,
        batch_norm=cfg.batch_norm,
    )
    if cfg.train_sampler == "proposal":
        from nerf_keras_tpu.ops.proposal import init_proposal_chain

        # Config validation rejects batch_norm in proposal mode.
        params = {
            "proposal": init_proposal_chain(
                k_coarse, cfg.prop_levels, l_xyz=cfg.prop_l_xyz,
                hidden=cfg.prop_hidden, depth=cfg.prop_depth,
            ),
            "fine": init_nerf_params(k_fine, **kwargs),
        }
        opt_state = make_optimizer(cfg).init(params)
        return TrainState(
            params, None, opt_state, jnp.zeros((), jnp.int32),
            ema=_init_ema(cfg, params),
        )
    params = {
        "coarse": init_nerf_params(k_coarse, **kwargs),
        "fine": init_nerf_params(k_fine, **kwargs),
    }
    bn = None
    if cfg.batch_norm:
        bn = {name: init_bn_state(p) for name, p in params.items()}
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(
        params, bn, opt_state, jnp.zeros((), jnp.int32),
        ema=_init_ema(cfg, params),
    )


def _init_ema(cfg: NeRFConfig, params: dict) -> dict | None:
    """EMA shadow initialized to a COPY of the initial params (no
    zero-init/debias: the shadow must be a valid model from step 0 so
    early evals and emergency checkpoints work).  A copy, not an alias —
    the jitted train step donates the state, and aliased leaves would be
    donated twice."""
    if cfg.ema_decay <= 0.0:
        return None
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over all elements (keras.losses.MeanSquaredError)."""
    return jnp.mean(jnp.square(a - b))


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """PSNR as keras ops.psnr (reference models.py:110)."""
    m = mse(a, b)
    return 20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(m)


def _mlp_fn(cfg: NeRFConfig, mesh=None) -> Callable:
    """Select the MLP evaluation path (jnp reference vs Pallas fused).

    The Pallas kernel is an opaque custom call to the GSPMD partitioner, so
    under a >1-chip data mesh it must be explicitly mapped over the sharded
    ray axis with ``shard_map`` (params replicated, batch split on 'data');
    the jnp path needs nothing — XLA partitions it from the shardings alone.
    """
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if cfg.use_pallas:
        from jax.sharding import PartitionSpec as P

        from nerf_keras_tpu.ops.pallas.fused_mlp import apply_nerf_mlp_pallas
        from nerf_keras_tpu.parallel.mesh import DATA_AXIS

        def apply(params, x_enc, d_enc):
            # Encodings are stored in the compute dtype: the kernel casts
            # to it anyway, and (N, 63)-ish arrays are lane-padded to 128
            # on TPU, so a bf16 store halves real HBM traffic for the
            # kernel inputs AND the custom_vjp residuals.
            return apply_nerf_mlp_pallas(
                params,
                x_enc.astype(compute_dtype),
                d_enc.astype(compute_dtype),
                compute_dtype=compute_dtype,
                skip_layer=cfg.skip_layer,
                # With stop_pdf_gradient (default) nothing differentiable
                # feeds the encodings, so the backward kernel skips the
                # input-gradient matmuls and HBM writes entirely.
                need_input_grads=not cfg.stop_pdf_gradient,
            )

        if mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1:
            apply = jax.shard_map(
                apply,
                mesh=mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
                # pallas_call outputs carry no varying-mesh-axes metadata
                check_vma=False,
            )

        def run(params, x_enc, d_enc, bn_state, train):
            # Pallas path has no BatchNorm variant; config validation
            # rejects use_pallas+batch_norm upstream.
            return apply(params, x_enc, d_enc), bn_state

        return run

    def run(params, x_enc, d_enc, bn_state, train):
        return apply_nerf_mlp(
            params,
            x_enc,
            d_enc,
            compute_dtype=compute_dtype,
            skip_layer=cfg.skip_layer,
            bn_state=bn_state,
            train=train,
        )

    return run


def make_forward_pass(
    cfg: NeRFConfig, mesh=None, return_t_fine: bool = False
) -> Callable:
    """Build the coarse→fine forward pass (reference models.py:151-176).

    Returned signature:
        forward(params, bn, key, origins, dirs, t_vals, train)
          -> ((rgb_coarse, rgb_fine), (depth_coarse, depth_fine),
              (weights_coarse, weights_fine), (preds_coarse, preds_fine)),
             new_bn

    ``return_t_fine=True`` appends the fine pass's sorted t-union as a
    third element (the distortion regularizer pairs it with
    ``weights_fine``; keeping the default arity stable spares every other
    caller).
    """
    mlp = _mlp_fn(cfg, mesh)
    # Encodings are stored in the compute dtype on BOTH paths: the MLP
    # casts them to it anyway (so results are bit-identical), they sit at
    # fusion boundaries (the skip concat reuses x_enc, so XLA materializes
    # it), and (N, 63)/(N, 27) arrays are lane-padded to 128 on TPU — a
    # bf16 store halves the real HBM traffic.
    enc_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def forward(params, bn, key, ray_origins, ray_directions, t_vals, train):
        bn = bn or {"coarse": None, "fine": None}
        new_bn = dict(bn)

        points, dirs = sample_rays(ray_origins, ray_directions, t_vals)
        x_enc = encode_position(points, cfg.l_xyz).astype(enc_dtype)
        d_enc = encode_position(dirs, cfg.l_dir).astype(enc_dtype)

        preds_coarse, new_bn["coarse"] = mlp(
            params["coarse"], x_enc, d_enc, bn["coarse"], train
        )
        rgb_coarse, depth_coarse, weights_coarse = volume_render(preds_coarse, t_vals)

        # Hierarchical importance sampling (models.py:165-167).  The coarse
        # weights are detached by default before the inverse-CDF draw (see
        # NeRFConfig.stop_pdf_gradient): the interp denominator clamp can
        # amplify gradients into the coarse density head by ~1e5 and was
        # measured to collapse the coarse rgb output.
        t_mid = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        w_for_pdf = (
            jax.lax.stop_gradient(weights_coarse)
            if cfg.stop_pdf_gradient
            else weights_coarse
        )
        t_fine = sample_pdf(
            key, t_mid, w_for_pdf, cfg.ns_fine,
            deterministic=key is None,
        )
        t_all = sorted_union(t_vals, t_fine)

        points_f, dirs_f = sample_rays(ray_origins, ray_directions, t_all)
        xf_enc = encode_position(points_f, cfg.l_xyz).astype(enc_dtype)
        df_enc = encode_position(dirs_f, cfg.l_dir).astype(enc_dtype)

        preds_fine, new_bn["fine"] = mlp(
            params["fine"], xf_enc, df_enc, bn["fine"], train
        )
        rgb_fine, depth_fine, weights_fine = volume_render(preds_fine, t_all)

        if cfg.white_bkgd:
            rgb_coarse = composite_background(rgb_coarse, weights_coarse)
            rgb_fine = composite_background(rgb_fine, weights_fine)

        outputs = (
            (rgb_coarse, rgb_fine),
            (depth_coarse, depth_fine),
            (weights_coarse, weights_fine),
            (preds_coarse, preds_fine),
        )
        if bn["coarse"] is None:
            new_bn = None
        if return_t_fine:
            return outputs, new_bn, t_all
        return outputs, new_bn

    return forward


def _make_fused_train_forward(
    cfg: NeRFConfig, mesh=None, want_weights: bool = False
) -> Callable:
    """Training forward for the fully fused Pallas path: each pass is ONE
    ray megakernel (ops/pallas/fused_render.py:render_rays_fused) — sample
    expansion, Fourier encoding, the MLP and alpha compositing all stay in
    VMEM, so neither the lane-padded encodings nor the ``(B*S, 4)``
    predictions/cotangents ever touch HBM.  Valid only with detached
    importance sampling (``stop_pdf_gradient``); returns
    ``(rgb_coarse, rgb_fine)``.

    ``want_weights=True`` (the distortion-regularized step): the FINE
    pass runs with ``weights_grad=True`` — its weights output is
    differentiable through the kernel's weights-cotangent path — and the
    forward returns ``(rgb_coarse, rgb_fine, t_all, w_fine)``.  The
    coarse pass stays on the zero-cotangent variant (its weights feed
    only the detached importance sampling).
    """
    from jax.sharding import PartitionSpec as P

    from nerf_keras_tpu.ops.pallas.fused_render import render_rays_fused
    from nerf_keras_tpu.parallel.mesh import DATA_AXIS

    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def _make_render(weights_grad: bool):
        def render(params, origins, dirs, t_vals):
            # Raw rays in: the megakernel expands/encodes in VMEM on both
            # the forward and the backward recompute — XLA-side encodings
            # would materialize lane-padded to 128 and their producer
            # fusions are tile-padded VPU loops (docs/PERF.md round-2).
            return render_rays_fused(
                params, origins, dirs, t_vals,
                l_xyz=cfg.l_xyz, l_dir=cfg.l_dir,
                compute_dtype=compute_dtype, skip_layer=cfg.skip_layer,
                weights_grad=weights_grad,
            )

        if mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1:
            render = jax.shard_map(
                render,
                mesh=mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                check_vma=False,
            )
        return render

    # white_bkgd's (1 - acc) term needs weight-gradients on BOTH passes;
    # the distortion regularizer needs them on the fine pass only.
    render = _make_render(cfg.white_bkgd)
    render_fine = (
        _make_render(True) if (want_weights or cfg.white_bkgd) else render
    )

    def forward(params, key, ray_origins, ray_directions, t_vals):
        rgb_coarse, weights_coarse = render(
            params["coarse"], ray_origins, ray_directions, t_vals
        )
        if cfg.white_bkgd:
            rgb_coarse = composite_background(rgb_coarse, weights_coarse)

        # Importance sampling + union stay in XLA: the MXU-one-hot
        # sample_pdf + lax.sort measured FASTER (4.66 ms vs 5.65 at the
        # 16384-ray chunk) than the fused Pallas pdf+union kernel — the
        # kernel's rank-position merge is VPU-issue-bound at O((S+NF)^2)
        # per ray while the one-hot einsum rides the MXU; see
        # experimental/pdf_union.py for the measured negative result.
        t_mid = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        t_fine = sample_pdf(
            key, t_mid, jax.lax.stop_gradient(weights_coarse), cfg.ns_fine,
            deterministic=key is None,
        )
        t_all = sorted_union(t_vals, t_fine)

        rgb_fine, w_fine = render_fine(
            params["fine"], ray_origins, ray_directions, t_all
        )
        if cfg.white_bkgd:
            rgb_fine = composite_background(rgb_fine, w_fine)
        if want_weights:
            return rgb_coarse, rgb_fine, t_all, w_fine
        return rgb_coarse, rgb_fine

    return forward


def _make_fused_eval_forward(cfg: NeRFConfig, mesh=None) -> Callable:
    """Forward-only coarse→fine via the ray-level Pallas megakernel
    (ops/pallas/fused_render.py:render_rays_fused): per-sample positions,
    Fourier encoding, the MLP and alpha compositing all stay in VMEM.

    Why not the XLA path or the encode-outside kernel (round-2 HLO + A/B
    measurements, docs/PERF.md): the XLA-side encode chain materializes
    (N, 3) points and (N, 63)/(N, 27) encodings, which TPU lane-pads to
    128 — XLA lowers them into tile-padded VPU loop fusions costing more
    than the MLP savings.  Feeding the kernel raw (B, 3) rays removes the
    whole chain.

    Depth is recovered from the kernel's weights output as
    ``sum(weights * t)`` — identical to ops/volume.py's composite.
    Returns ``forward(params, origins, dirs, t_vals) -> dict`` with
    rgb/depth/weights for both passes (no raw preds — the ``full=True``
    render keeps the jnp path).
    """
    from jax.sharding import PartitionSpec as P

    from nerf_keras_tpu.ops.pallas.fused_render import render_rays_fused
    from nerf_keras_tpu.parallel.mesh import DATA_AXIS

    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def render_pass(params, origins, dirs, t_vals):
        return render_rays_fused(
            params, origins, dirs, t_vals,
            l_xyz=cfg.l_xyz, l_dir=cfg.l_dir,
            compute_dtype=compute_dtype, skip_layer=cfg.skip_layer,
        )

    if mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1:
        render_pass = jax.shard_map(
            render_pass,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            check_vma=False,
        )

    def forward(params, ray_origins, ray_directions, t_vals):
        rgb_coarse, w_coarse = render_pass(
            params["coarse"], ray_origins, ray_directions, t_vals
        )
        depth_coarse = jnp.sum(w_coarse * t_vals, axis=-1)

        # pdf+union stays on the XLA path — the fused Pallas alternative
        # measured SLOWER (experimental/pdf_union.py docstring).
        t_mid = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        t_fine = sample_pdf(None, t_mid, w_coarse, cfg.ns_fine,
                            deterministic=True)
        t_all = sorted_union(t_vals, t_fine)

        rgb_fine, w_fine = render_pass(
            params["fine"], ray_origins, ray_directions, t_all
        )
        depth_fine = jnp.sum(w_fine * t_all, axis=-1)
        if cfg.white_bkgd:
            rgb_coarse = composite_background(rgb_coarse, w_coarse)
            rgb_fine = composite_background(rgb_fine, w_fine)
        return {
            "rgb_coarse": rgb_coarse,
            "rgb_fine": rgb_fine,
            "depth_coarse": depth_coarse,
            "depth_fine": depth_fine,
            "weights_coarse": w_coarse,
            "weights_fine": w_fine,
        }

    return forward


def _make_pass_fn(
    cfg: NeRFConfig, mesh=None, quant: bool = False,
    weights_grad: bool = False,
) -> Callable:
    """One MLP render pass ``(params, origins, dirs, t_vals) -> (rgb,
    weights)`` — Pallas megakernel or XLA per ``cfg.use_pallas``, float or
    int8 per ``quant``, shard_map'd over the data mesh axis when it spans
    more than one device.  ``params`` is one model's params (float) or
    one model's qparams (int8).  Shared by the quant render path and the
    proposal-sampler fine pass.

    ``weights_grad=True`` (float Pallas only): the weights output stays
    differentiable — needed when a weight-space loss (distortion)
    consumes it.  The XLA pass is always differentiable; int8 is
    inference-only."""
    from jax.sharding import PartitionSpec as P

    from nerf_keras_tpu.parallel.mesh import DATA_AXIS

    if quant:
        if cfg.use_pallas:
            from nerf_keras_tpu.ops.pallas.quant_render import (
                render_rays_fused_quant,
            )

            def render_pass(p, origins, dirs, t_vals):
                return render_rays_fused_quant(
                    p, origins, dirs, t_vals,
                    l_xyz=cfg.l_xyz, l_dir=cfg.l_dir,
                    skip_layer=cfg.skip_layer,
                )
        else:
            from nerf_keras_tpu.ops.quant import apply_nerf_mlp_quant

            def render_pass(p, origins, dirs, t_vals):
                points, dirs_s = sample_rays(origins, dirs, t_vals)
                x_enc = encode_position(points, cfg.l_xyz)
                d_enc = encode_position(dirs_s, cfg.l_dir)
                preds = apply_nerf_mlp_quant(
                    p, x_enc, d_enc, skip_layer=cfg.skip_layer
                )
                rgb, _depth, weights = volume_render(preds, t_vals)
                return rgb, weights
    else:
        compute_dtype = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        )
        if cfg.use_pallas:
            from nerf_keras_tpu.ops.pallas.fused_render import render_rays_fused

            def render_pass(p, origins, dirs, t_vals):
                return render_rays_fused(
                    p, origins, dirs, t_vals,
                    l_xyz=cfg.l_xyz, l_dir=cfg.l_dir,
                    compute_dtype=compute_dtype, skip_layer=cfg.skip_layer,
                    weights_grad=weights_grad,
                )
        else:
            from nerf_keras_tpu.models.mlp import apply_nerf_mlp

            def render_pass(p, origins, dirs, t_vals):
                points, dirs_s = sample_rays(origins, dirs, t_vals)
                x_enc = encode_position(points, cfg.l_xyz).astype(compute_dtype)
                d_enc = encode_position(dirs_s, cfg.l_dir).astype(compute_dtype)
                preds, _ = apply_nerf_mlp(
                    p, x_enc, d_enc, compute_dtype=compute_dtype,
                    skip_layer=cfg.skip_layer,
                )
                rgb, _depth, weights = volume_render(preds, t_vals)
                return rgb, weights

    if mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1:
        render_pass = jax.shard_map(
            render_pass,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            check_vma=False,
        )
    return render_pass


def make_proposal_render_fn(
    cfg: NeRFConfig,
    near: float,
    far: float,
    mesh=None,
    quant: bool = False,
    prop_l_xyz: int = 4,
    union: bool = True,
    want_weights: bool = False,
    levels: int = 1,
    prop_samples: int = 0,
) -> Callable:
    """Build the proposal-sampled render for a flat ray batch
    (beyond-reference; design rationale in ops/proposal.py).

    ``want_weights=True`` additionally returns the fine pass's
    compositing weights (``weights_fine``, shape (B, S)) and the sorted
    sample positions they weight (``t_fine``) — a separate compilation
    so the common rgb/depth path never pays the (B, S) HBM writes +
    host fetches.  The weights already exist on every pass path (depth
    and background compositing consume them), so this is free compute.

    Signature: ``render(pparams, fine_params, origins, dirs) -> dict``
    with ``rgb_fine``/``depth_fine`` only — there is no coarse pass to
    report: the tiny distilled proposal net places the fine samples
    (~1-2 ms of auto-sharded XLA vs the 12.5-14.8 ms coarse kernel),
    then ONE fine pass composites.  ``fine_params`` is the fine model's
    float params, or its qparams when ``quant`` (int8 fine megakernel —
    the two accelerations stack).

    Sample layout matches the parity path exactly: ``ns_fine`` inverse-
    CDF draws from the proposal weights at the ``ns_coarse`` centered
    t-values, unioned with those t-values — the fine kernel sees the
    same (B, ns_coarse + ns_fine) shape either way.  With ``union=False``
    (online ``PROP_UNION=false`` configs) the fine kernel sees ONLY the
    ``ns_fine`` placed samples — Mip-NeRF-360 layout, ~33% fewer
    fine-pass FLOPs at flagship counts.  ``levels``/``prop_samples``
    select the stacked proposal chain (:func:`_make_chain_sampler`).
    """
    fine_pass = _make_pass_fn(cfg, mesh=mesh, quant=quant)
    chain = _make_chain_sampler(
        cfg, prop_l_xyz, union, levels, prop_samples, train=False
    )

    def render(pparams, fine_params, origins, dirs):
        t_vals = generate_t_vals(
            None, near, far, origins.shape[:-1], cfg.ns_coarse, "center"
        )
        t_all, _ = chain(pparams, origins, dirs, t_vals, None, None)

        rgb_fine, w_fine = fine_pass(fine_params, origins, dirs, t_all)
        depth_fine = jnp.sum(w_fine * t_all, axis=-1)
        if cfg.white_bkgd:
            rgb_fine = composite_background(rgb_fine, w_fine)
        out = {"rgb_fine": rgb_fine, "depth_fine": depth_fine}
        if want_weights:
            out["weights_fine"] = w_fine
            out["t_fine"] = t_all
        return out

    return render


def make_quant_render_fn(
    cfg: NeRFConfig, near: float, far: float, mesh=None
) -> Callable:
    """Build the int8 render function for a flat ray batch.

    Signature: ``render(qparams, origins, dirs) -> dict`` with rgb/depth
    for coarse and fine — the same contract as :func:`make_render_fn`'s
    common path, but running both MLP passes through the int8 megakernel
    (ops/pallas/quant_render.py; int8 x int8 -> int32 on the MXU at 2x
    the bf16 rate on v5e).  ``qparams`` comes from
    ops/quant.py:quantize_render_params after calibration — see
    ``Trainer.quantize_for_inference``.

    pdf+union and the compositing weights stay f32 exactly as the bf16
    eval path; only the MLP arithmetic is quantized.

    Without ``cfg.use_pallas`` the pass runs the XLA fallback — the SAME
    integer pipeline (ops/quant.py:apply_nerf_mlp_quant traces the shared
    ``quant_forward_tile``) via encode → int8 MLP → volume_render, so
    CPU/debug renders are bit-identical to the kernel, just without the
    in-VMEM fusion.
    """
    render_pass = _make_pass_fn(cfg, mesh=mesh, quant=True)

    def render(qparams, origins, dirs):
        t_vals = generate_t_vals(
            None, near, far, origins.shape[:-1], cfg.ns_coarse, "center"
        )
        rgb_coarse, w_coarse = render_pass(
            qparams["coarse"], origins, dirs, t_vals
        )
        depth_coarse = jnp.sum(w_coarse * t_vals, axis=-1)

        t_mid = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        t_fine = sample_pdf(None, t_mid, w_coarse, cfg.ns_fine,
                            deterministic=True)
        t_all = sorted_union(t_vals, t_fine)

        rgb_fine, w_fine = render_pass(
            qparams["fine"], origins, dirs, t_all
        )
        depth_fine = jnp.sum(w_fine * t_all, axis=-1)
        if cfg.white_bkgd:
            rgb_coarse = composite_background(rgb_coarse, w_coarse)
            rgb_fine = composite_background(rgb_fine, w_fine)
        return {
            "rgb_coarse": rgb_coarse,
            "rgb_fine": rgb_fine,
            "depth_coarse": depth_coarse,
            "depth_fine": depth_fine,
        }

    return render


def _check_freq_anneal_resolved(cfg: NeRFConfig) -> None:
    if cfg.freq_anneal_steps == -1:
        raise ValueError(
            "FREQ_ANNEAL_STEPS=-1 (auto) must be resolved to a step count "
            "before building steps — the training CLI does this; direct "
            "callers pass an explicit count"
        )


def _wrap_state_fold(cfg: NeRFConfig, fn: Callable) -> Callable:
    """Apply the frequency-anneal weight fold (ops/freq_anneal.py) to a
    state-consuming eval/render function.  The fold uses the state's
    CURRENT step — masked octaves hold random init values, so mid-anneal
    eval must see the same window training does; past the horizon the
    window is identity.  Traced inside whatever jit wraps ``fn``."""
    if cfg.freq_anneal_steps == 0:
        return fn
    _check_freq_anneal_resolved(cfg)

    def folded(state: TrainState, *args):
        state = state._replace(
            params=fold_train_params(cfg, state.params, state.step)
        )
        return fn(state, *args)

    return folded


def make_train_step(cfg: NeRFConfig, near: float, far: float, mesh=None) -> Callable:
    """Build the jitted train step.

    Signature: ``train_step(state, batch, key) -> (state, metrics)`` where
    ``batch = (images, ray_origins, ray_directions)`` — note t-values are
    generated inside from ``key`` (stratified per step), unlike the
    reference pipeline which ships frozen t-values with every batch
    (data_utils.py:156-157).
    """
    _check_freq_anneal_resolved(cfg)
    optimizer = make_optimizer(cfg)
    fused_render = bool(cfg.use_pallas) and cfg.stop_pdf_gradient
    loss_union_il = None  # set by the proposal branch under PROP_UNION_EVERY

    if cfg.train_sampler == "proposal":
        # Online proposal-sampler training (beyond-reference; config
        # docstring): the tiny proposal net places the fine samples and is
        # trained jointly by distilling the fine pass's (detached)
        # compositing-weight histogram — the 8x256 coarse MLP (~25% of
        # the step's MLP FLOPs, reference models.py:151-165) disappears
        # from the step.  The fine pass runs the same megakernel/XLA path
        # as the parity trainer; the proposal chain is plain XLA (tiny
        # matmuls auto-shard under jit like sample_pdf).
        from nerf_keras_tpu.ops.proposal import (
            binned_fine_weights,
            interlevel_loss,
        )

        if cfg.prop_anneal_steps < 0:
            raise ValueError(
                "PROP_ANNEAL_STEPS=-1 (auto) must be resolved to a step "
                "count before building the train step — the training CLI "
                "does this; direct callers pass an explicit count"
            )

        fine_pass = _make_pass_fn(
            cfg, mesh=mesh,
            weights_grad=cfg.distortion_loss_mult > 0.0 or cfg.white_bkgd,
        )

        def _build_prop_loss(union: bool):
            """Loss for one sample LAYOUT.  Built twice under
            PROP_UNION_EVERY (interleaved union/union-free steps, one
            lax.cond in the compiled step); once otherwise."""
            chain = _make_chain_sampler(
                cfg, cfg.prop_l_xyz, union, cfg.prop_levels,
                cfg.prop_samples, train=True,
            )
            # Aux coverage pass rides the UNION-FREE layout only (the
            # union layout's uniform samples already supervise the fine
            # MLP everywhere — config docstring).
            aux_n = 0 if union else cfg.prop_aux_samples

            def _blur_level(i: int) -> bool:
                # Blur rule (PROP_TARGET_BLUR=None = auto): blur any target
                # whose partition is at SAMPLE resolution — the union-free
                # layout (every level), and every non-first chain level (its
                # partition is built from draws, so ~1 fine sample per bin
                # makes the binned target a high-variance placement
                # estimate).  The union layout's level-1 target (128 samples
                # into 64 uniform bins) stays unblurred — measured no
                # benefit there (config docstring).
                if cfg.prop_target_blur is not None:
                    return cfg.prop_target_blur
                return (not union) or i > 0

            def distill_target(t_all, w_fine_sg, t_part, blur):
                # Detached target (the Pallas path already stop-gradients its
                # weights output; the jnp path needs it explicit): the fine
                # model must never be pulled toward the proposal.
                target = binned_fine_weights(t_all, w_fine_sg, t_part)
                if blur:
                    # Union-free target is a HIGH-VARIANCE estimate: bins get
                    # mass only where samples landed, and an isolated
                    # exploration sample carries a huge compositing delta —
                    # measured as 1-2 dB val loss and transient collapses
                    # (docs/PERF.md).  A [1/4, 1/2, 1/4] dilation along the
                    # bins (Mip-NeRF 360's histogram blur) spreads each
                    # sample's mass to its neighbours, cutting the spike
                    # variance while preserving total mass (edge bins keep
                    # their outward quarter).  PROP_TARGET_BLUR overrides the
                    # layout rule (None = blur iff union-free).
                    left = jnp.concatenate(
                        [target[..., :1], target[..., :-1]], axis=-1
                    )
                    right = jnp.concatenate(
                        [target[..., 1:], target[..., -1:]], axis=-1
                    )
                    target = 0.25 * left + 0.5 * target + 0.25 * right
                return target

            def loss_fn(params, bn, key_pdf, t_vals, images, origins, dirs,
                        step):
                if aux_n:
                    key_pdf, key_aux = jax.random.split(key_pdf)
                t_all, levels = chain(
                    params["proposal"], origins, dirs, t_vals, key_pdf, step
                )
                rgb_fine, w_fine = fine_pass(
                    params["fine"], origins, dirs, t_all
                )
                if cfg.white_bkgd:
                    rgb_fine = composite_background(rgb_fine, w_fine)
                loss_fine = mse(images, rgb_fine)
                # Every proposal level distills from the fine pass's weights
                # binned into ITS OWN partition (Mip-NeRF 360 trains each
                # proposal against the final NeRF histogram).
                w_fine_sg = jax.lax.stop_gradient(w_fine)
                loss_prop = jnp.zeros((), jnp.float32)
                for i, (w_prop, t_part) in enumerate(levels):
                    loss_prop = loss_prop + interlevel_loss(
                        w_prop,
                        distill_target(t_all, w_fine_sg, t_part,
                                       _blur_level(i)),
                    )
                loss = loss_fine + cfg.prop_loss_mult * loss_prop
                if cfg.distortion_loss_mult > 0.0:
                    # Undetached w_fine: distortion needs gradients into the
                    # fine density head (the fused kernel provides them via
                    # its weights-cotangent path when the pass was built with
                    # weights_grad=True; the jnp path natively).
                    loss = loss + cfg.distortion_loss_mult * distortion_loss(
                        t_all, w_fine, near, far
                    )
                if aux_n:
                    # Auxiliary coverage composite (PROP_AUX_SAMPLES):
                    # aux_n fresh stratified-uniform samples through the
                    # SAME fine MLP, composited and supervised by the
                    # image like the reference's coarse rgb loss — the
                    # uniform-coverage supervision the union-free layout
                    # loses (the proven mechanism of its ~2 dB converged
                    # gap, docs/PERF.md round-4).  Training-only.
                    t_aux = generate_t_vals(
                        key_aux, near, far, images.shape[:-1], aux_n,
                        "stratified",
                    )
                    rgb_aux, w_aux = fine_pass(
                        params["fine"], origins, dirs, t_aux
                    )
                    if cfg.white_bkgd:
                        rgb_aux = composite_background(rgb_aux, w_aux)
                    loss = loss + cfg.prop_aux_loss_mult * mse(
                        images, rgb_aux
                    )
                # loss_prop rides the 'loss_coarse' metric slot: there is no
                # coarse rgb loss in this mode, and keeping the reference's
                # history keys lets every consumer (History, panels, CLI
                # prints) work unchanged.
                return loss, (loss_prop, loss_fine, rgb_fine, bn)

            return loss_fn

        if cfg.prop_union_every > 0:
            # Interleaved layouts (PROP_UNION_EVERY=N): both losses live
            # in ONE compiled step behind a lax.cond on the step counter
            # — every Nth step pays the union layout's uniform samples,
            # the rest run the fast union-free layout.  Both branches
            # produce identical grads/aux pytree structures.
            loss_union_il = _build_prop_loss(True)
            loss_fn = _build_prop_loss(False)
        else:
            loss_union_il = None
            loss_fn = _build_prop_loss(cfg.prop_union)
    elif fused_render:
        want_dist = cfg.distortion_loss_mult > 0.0
        fwd_fused = _make_fused_train_forward(cfg, mesh,
                                              want_weights=want_dist)

        def loss_fn(params, bn, key_pdf, t_vals, images, origins, dirs, step):
            del step  # anneal is proposal-mode only
            res = fwd_fused(params, key_pdf, origins, dirs, t_vals)
            rgb_coarse, rgb_fine = res[0], res[1]
            loss_coarse = mse(images, rgb_coarse)
            loss_fine = mse(images, rgb_fine)
            loss = loss_coarse + loss_fine
            if want_dist:
                # res = (rgb_c, rgb_f, t_all, w_fine); w_fine is
                # differentiable through the megakernel's weights-
                # cotangent backward (render_rays_fused weights_grad).
                loss = loss + cfg.distortion_loss_mult * distortion_loss(
                    res[2], res[3], near, far
                )
            return loss, (loss_coarse, loss_fine, rgb_fine, bn)
    else:
        want_dist = cfg.distortion_loss_mult > 0.0
        forward = make_forward_pass(cfg, mesh, return_t_fine=want_dist)

        def loss_fn(params, bn, key_pdf, t_vals, images, origins, dirs, step):
            del step  # anneal is proposal-mode only
            res = forward(params, bn, key_pdf, origins, dirs, t_vals, True)
            outputs, new_bn = res[0], res[1]
            (rgb_coarse, rgb_fine) = outputs[0]
            loss_coarse = mse(images, rgb_coarse)
            loss_fine = mse(images, rgb_fine)
            loss = loss_coarse + loss_fine
            if want_dist:
                # Fine-pass weights carry gradients on this (jnp) path;
                # the regularizer rides the fine pass only (Mip-NeRF 360
                # applies it to the final level).
                loss = loss + cfg.distortion_loss_mult * distortion_loss(
                    res[2], outputs[2][1], near, far
                )
            return loss, (loss_coarse, loss_fine, rgb_fine, new_bn)

    if cfg.freq_anneal_steps > 0:
        # Frequency-anneal weight fold INSIDE the differentiated loss
        # (ops/freq_anneal.py): every path below sees windowed weights,
        # and autodiff chains dW = window * dW_folded — masked octave
        # rows get exactly zero gradient and stay at init until their
        # window opens.
        def _fold_wrap(inner_loss):
            def wrapped(params, bn, key_pdf, t_vals, images, origins, dirs,
                        step):
                folded = fold_train_params(cfg, params, step)
                return inner_loss(
                    folded, bn, key_pdf, t_vals, images, origins, dirs, step
                )

            return wrapped

        loss_fn = _fold_wrap(loss_fn)
        if loss_union_il is not None:
            loss_union_il = _fold_wrap(loss_union_il)

    if loss_union_il is not None:
        # PROP_UNION_EVERY: both layouts compile into the step; the cond
        # dispatches per step counter at runtime.  Pytree structures of
        # (grads, aux) are identical across branches (same params, same
        # metric shapes), which lax.cond requires.
        def grad_fn(params, bn, key_pdf, t_vals, images, origins, dirs,
                    step):
            return jax.lax.cond(
                (step % cfg.prop_union_every) == 0,
                lambda a: jax.grad(loss_union_il, has_aux=True)(*a),
                lambda a: jax.grad(loss_fn, has_aux=True)(*a),
                (params, bn, key_pdf, t_vals, images, origins, dirs, step),
            )
    else:
        def grad_fn(*args):
            return jax.grad(loss_fn, has_aux=True)(*args)

    def train_step(state: TrainState, batch, key: jax.Array):
        images, origins, dirs = batch
        key_t, key_pdf = jax.random.split(jax.random.fold_in(key, state.step))
        t_vals = generate_t_vals(
            key_t, near, far, images.shape[:-1], cfg.ns_coarse, cfg.sampling_mode
        )
        grads, (loss_coarse, loss_fine, rgb_fine, new_bn) = grad_fn(
            state.params, state.bn, key_pdf, t_vals, images, origins, dirs,
            state.step)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if cfg.ema_decay > 0.0:
            d = cfg.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, state.ema, params
            )
        else:
            ema = state.ema
        metrics = {
            "loss_coarse": loss_coarse,
            "loss": loss_fine,
            "psnr": psnr(images, rgb_fine),
        }
        return TrainState(params, new_bn, opt_state, state.step + 1, ema), metrics

    return train_step


def make_eval_step(cfg: NeRFConfig, near: float, far: float, mesh=None) -> Callable:
    """Build the eval step (reference ``test_step``, models.py:122-145).

    Deterministic: centered t-values and midpoint inverse-CDF draws, so
    validation metrics are reproducible (the reference evaluates with fresh
    randomness every time).

    With ``cfg.use_pallas`` the fused MLP+composite forward kernel is used
    (~1.5x the XLA path's forward throughput on v5e, see
    :func:`_make_fused_eval_forward`); the math is identical.
    """
    if cfg.train_sampler == "proposal":
        from nerf_keras_tpu.ops.proposal import (
            binned_fine_weights,
            interlevel_loss,
        )

        fine_pass = _make_pass_fn(cfg, mesh=mesh)
        chain = _make_chain_sampler(
            cfg, cfg.prop_l_xyz, cfg.prop_union, cfg.prop_levels,
            cfg.prop_samples, train=False,
        )

        def eval_step_proposal(state: TrainState, batch):
            images, origins, dirs = batch
            t_vals = generate_t_vals(
                None, near, far, images.shape[:-1], cfg.ns_coarse, "center"
            )
            t_all, levels = chain(
                state.params["proposal"], origins, dirs, t_vals, None, None
            )
            rgb_fine, w_fine = fine_pass(
                state.params["fine"], origins, dirs, t_all
            )
            if cfg.white_bkgd:
                rgb_fine = composite_background(rgb_fine, w_fine)
            # No coarse rgb exists; the slot reports the distillation
            # loss summed over levels (how well the chain tracks the
            # fine histogram).
            distill = 0.0
            for w_prop, t_part in levels:
                distill = distill + interlevel_loss(
                    w_prop, binned_fine_weights(t_all, w_fine, t_part)
                )
            return {
                "loss_coarse": distill,
                "loss": mse(images, rgb_fine),
                "psnr": psnr(images, rgb_fine),
            }

        return _wrap_state_fold(cfg, eval_step_proposal)

    if cfg.use_pallas:
        fwd_fused = _make_fused_eval_forward(cfg, mesh)

        def eval_step(state: TrainState, batch):
            images, origins, dirs = batch
            t_vals = generate_t_vals(
                None, near, far, images.shape[:-1], cfg.ns_coarse, "center"
            )
            out = fwd_fused(state.params, origins, dirs, t_vals)
            return {
                "loss_coarse": mse(images, out["rgb_coarse"]),
                "loss": mse(images, out["rgb_fine"]),
                "psnr": psnr(images, out["rgb_fine"]),
            }

        return _wrap_state_fold(cfg, eval_step)

    forward = make_forward_pass(cfg, mesh)

    def eval_step(state: TrainState, batch):
        images, origins, dirs = batch
        t_vals = generate_t_vals(
            None, near, far, images.shape[:-1], cfg.ns_coarse, "center"
        )
        outputs, _ = forward(state.params, state.bn, None, origins, dirs, t_vals, False)
        (rgb_coarse, rgb_fine) = outputs[0]
        return {
            "loss_coarse": mse(images, rgb_coarse),
            "loss": mse(images, rgb_fine),
            "psnr": psnr(images, rgb_fine),
        }

    return _wrap_state_fold(cfg, eval_step)


def make_render_fn(
    cfg: NeRFConfig, near: float, far: float, mesh=None, full: bool = False
) -> Callable:
    """Build the render function for a flat ray batch.

    Used by the chunked renderer (the reference's
    ``forward_pass_with_minibatch``, models.py:178-225, re-done as a jitted
    chunk function driven by a host loop).
    Returns ``render(state, origins, dirs) -> dict`` with rgb/depth for
    coarse and fine; with ``full=True`` the dict also carries the
    compositing weights and raw MLP predictions (the reference's
    8-tensor return, models.py:216-223).  ``full`` is a separate
    compilation: the extra maps are (B, S)/(B, S, 4) HBM writes + host
    fetches the common rgb/depth path shouldn't pay.

    With ``cfg.use_pallas`` (and not ``full`` — raw preds only exist on
    the jnp path) each pass renders through the fused forward kernel
    (:func:`_make_fused_eval_forward`; ~1.5x the XLA path on v5e).

    Proposal-trained configs (``cfg.train_sampler == 'proposal'``) render
    through the in-state proposal net — fine outputs only (there is no
    coarse model), so ``full`` raises.
    """
    if cfg.train_sampler == "proposal":
        if full:
            raise ValueError(
                "full=True is unavailable for TRAIN_SAMPLER='proposal' "
                "checkpoints: there is no coarse pass, and the proposal "
                "render emits rgb/depth fine only"
            )
        inner = make_proposal_render_fn(
            cfg, near, far, mesh=mesh, prop_l_xyz=cfg.prop_l_xyz,
            union=cfg.prop_union, levels=cfg.prop_levels,
            prop_samples=cfg.prop_samples,
        )

        def render_proposal(state: TrainState, origins, dirs):
            return inner(
                state.params["proposal"], state.params["fine"],
                origins, dirs,
            )

        return _wrap_state_fold(cfg, render_proposal)

    if cfg.use_pallas and not full:
        fwd_fused = _make_fused_eval_forward(cfg, mesh)

        def render_fused(state: TrainState, origins, dirs):
            t_vals = generate_t_vals(
                None, near, far, origins.shape[:-1], cfg.ns_coarse, "center"
            )
            out = fwd_fused(state.params, origins, dirs, t_vals)
            return {
                k: out[k]
                for k in ("rgb_coarse", "rgb_fine", "depth_coarse", "depth_fine")
            }

        return _wrap_state_fold(cfg, render_fused)

    forward = make_forward_pass(cfg, mesh)

    def render(state: TrainState, origins, dirs):
        t_vals = generate_t_vals(
            None, near, far, origins.shape[:-1], cfg.ns_coarse, "center"
        )
        outputs, _ = forward(state.params, state.bn, None, origins, dirs, t_vals, False)
        (rgb_coarse, rgb_fine) = outputs[0]
        (depth_coarse, depth_fine) = outputs[1]
        result = {
            "rgb_coarse": rgb_coarse,
            "rgb_fine": rgb_fine,
            "depth_coarse": depth_coarse,
            "depth_fine": depth_fine,
        }
        if full:
            (weights_coarse, weights_fine) = outputs[2]
            (preds_coarse, preds_fine) = outputs[3]
            result.update(
                weights_coarse=weights_coarse,
                weights_fine=weights_fine,
                preds_coarse=preds_coarse,
                preds_fine=preds_fine,
            )
        return result

    return _wrap_state_fold(cfg, render)
