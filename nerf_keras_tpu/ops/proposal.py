"""Distilled proposal sampler: replace the inference-time coarse pass.

Beyond-reference capability.  In the reference renderer (and our parity
path) the coarse MLP exists at inference ONLY to place the fine samples:
its weights feed the inverse-CDF draw and its rgb is discarded
(reference inference.py:224-268 renders ``rgb_fine``).  That placement
signal does not need an 8x256 MLP — a tiny density net distilled from
the TRAINED fine model predicts the same compositing-weight profile at
~60x fewer FLOPs, so the whole coarse pass (12.5-14.8 ms per 16384-ray
chunk on v5e) collapses to ~1-2 ms of MXU work.

Why an MLP and not an occupancy grid (NerfAcc / Instant-NGP style —
https://arxiv.org/pdf/2305.04966, https://arxiv.org/pdf/2201.05989):
on TPU a res^3 sigma table needs one random HBM gather per march sample,
and XLA gathers measured SLOWER than the coarse pass they would replace
(16.5 ms for 16384x64 nearest lookups at res=128 vs the 14.8 ms coarse
kernel — scripts/probe_grid_gather.py).  A tiny matmul chain rides the
MXU instead; this is the sample-field idea of NeuSample
(https://arxiv.org/pdf/2111.15552) / the proposal MLP of Mip-NeRF 360,
reshaped for TPU: batched, static shapes, bf16 dots.

Distillation is post-training and inference-only (like int8 quant,
ops/quant.py): targets come from the trained fine model's density head
along representative rays, so the proposal approximates the EXACT field
the fine pass will composite — arguably a better placement signal than
the parity path's independently-trained coarse model.  The loss is
asymmetric: underestimating density near surfaces loses fine samples
(visible error), overestimating merely wastes a few on empty space, so
under-predictions are penalized ``under_weight``-fold.

Accuracy is gated, not assumed: ``inference.py --sampler proposal``
renders the first frame with both samplers and falls back below the
PSNR gate, exactly like ``--quant int8``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from nerf_keras_tpu.ops.encoding import encode_position
from nerf_keras_tpu.ops.rays import sample_rays
from nerf_keras_tpu.ops.sampling import sample_pdf, sorted_union
from nerf_keras_tpu.ops.volume import volume_render

ProposalParams = dict


def init_proposal(
    key: jax.Array, l_xyz: int = 4, hidden: int = 64, depth: int = 3
) -> ProposalParams:
    """Tiny density net: ``depth`` glorot dense layers (relu between) on
    Fourier-encoded positions, scalar output.  No skip concat — at this
    depth the encoding never washes out."""
    dims = [3 + 6 * l_xyz] + [hidden] * (depth - 1) + [1]
    keys = jax.random.split(key, depth)
    layers = []
    for k, d_in, d_out in zip(keys, dims[:-1], dims[1:]):
        scale = jnp.sqrt(6.0 / (d_in + d_out))
        layers.append({
            "w": jax.random.uniform(k, (d_in, d_out), jnp.float32,
                                    -scale, scale),
            "b": jnp.zeros((d_out,), jnp.float32),
        })
    return {"layers": layers}


def apply_proposal(
    params: ProposalParams, x_enc: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Raw proposal output on encoded positions -> ``(...,)`` f32.

    The net regresses ``log1p(relu(sigma))`` (see :func:`distill_proposal`);
    use :func:`proposal_sigma` for the density itself.  bf16 dots are fine
    on the render path — the output only shapes a sampling PDF, and TPU
    XLA would bf16-truncate f32 dots anyway (CLAUDE.md trap; precision
    does not matter here, unlike sample_pdf's selector matmuls).
    """
    h = x_enc.astype(compute_dtype)
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        h = h @ layer["w"].astype(compute_dtype) + layer["b"].astype(compute_dtype)
        if i < n - 1:
            h = jnp.maximum(h, 0.0)
    return h[..., 0].astype(jnp.float32)


def proposal_sigma(
    params: ProposalParams, pts: jnp.ndarray, l_xyz: int,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Density at points: ``expm1(relu(net(enc(pts))))`` — inverse of the
    ``log1p`` target transform, clamped nonnegative."""
    raw = apply_proposal(params, encode_position(pts, l_xyz), compute_dtype)
    return jnp.expm1(jnp.maximum(raw, 0.0))


def init_proposal_chain(
    key: jax.Array, levels: int, l_xyz: int = 4, hidden: int = 64,
    depth: int = 3,
) -> ProposalParams:
    """Proposal net(s) for a ``levels``-deep sampling chain.

    ``levels == 1`` returns the single-net ``{'layers': ...}`` tree
    (checkpoint-compatible with every pre-chain run); ``levels == 2``
    returns ``{'l1': net, 'l2': net}`` — two independent tiny nets, one
    per refinement iteration (Mip-NeRF 360 §3.3 trains one proposal MLP
    per level; https://arxiv.org/pdf/2111.12077).  The chain exists to
    fix the PLACEMENT RESOLUTION limit of a single level: fine samples
    drawn from one ``ns_coarse``-bin histogram are uniform within a bin,
    so surface placement error is ~the uniform bin width; a second level
    re-bins at the first draw's samples, concentrating its bins where
    the mass is before the final draw.
    """
    if levels == 1:
        return init_proposal(key, l_xyz=l_xyz, hidden=hidden, depth=depth)
    keys = jax.random.split(key, levels)
    return {
        f"l{i + 1}": init_proposal(k, l_xyz=l_xyz, hidden=hidden, depth=depth)
        for i, k in enumerate(keys)
    }


def chain_nets(pparams: ProposalParams) -> list:
    """The per-level net params of a proposal chain, in draw order.

    Accepts both the single-net ``{'layers': ...}`` tree and the
    ``{'l1': ..., 'l2': ...}`` chain tree."""
    if "layers" in pparams:
        return [pparams]
    return [pparams[f"l{i + 1}"] for i in range(len(pparams))]


def proposal_weights(
    params: ProposalParams,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_vals: jnp.ndarray,
    l_xyz: int,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Compositing weights along rays from the proposal density alone.

    Plain XLA (auto-shards under jit like sample_pdf — no shard_map
    needed): the tiny matmul chain is ~60x fewer FLOPs than the coarse
    MLP it replaces.  Reuses ops/volume.py's exact compositing numerics
    via a zero-rgb preds tensor, so the downstream inverse-CDF sees
    weights with identical semantics to the coarse pass.
    """
    pts, _ = sample_rays(origins, directions, t_vals)
    sigma = proposal_sigma(params, pts, l_xyz, compute_dtype)
    preds = jnp.concatenate(
        [jnp.zeros(sigma.shape + (3,), jnp.float32), sigma[..., None]],
        axis=-1,
    )
    _, _, weights = volume_render(preds, t_vals)
    return weights


def binned_fine_weights(
    t_all: jnp.ndarray, w_fine: jnp.ndarray, t_vals: jnp.ndarray
) -> jnp.ndarray:
    """Aggregate fine-pass compositing weights into the coarse sample bins.

    ``t_vals (..., J)`` are the proposal-level sample positions (ascending);
    bin ``j`` covers ``[t_vals[j], t_vals[j+1])``, the last bin extends to
    infinity — matching ops/volume.py's interval semantics (delta_j =
    t_{j+1} - t_j, terminal 1e10).  Each fine sample at ``t_all (..., S)``
    contributes its weight ``w_fine`` to the bin containing it; fine
    samples at exactly a bin edge (the union re-uses t_vals verbatim)
    land in that bin.

    TPU-first formulation: exact 0/1 membership from two broadcast
    compares, contracted on the MXU (``precision=HIGHEST`` — TPU would
    otherwise bf16-truncate the f32 weights; CLAUDE.md trap) instead of a
    searchsorted/segment_sum gather chain.

    Returns ``(..., J)`` binned weights (sums to ``sum(w_fine)`` per ray).
    """
    ge = (t_all[..., :, None] >= t_vals[..., None, :]).astype(jnp.float32)
    member = ge - jnp.concatenate(
        [ge[..., 1:], jnp.zeros_like(ge[..., :1])], axis=-1
    )
    return jnp.einsum(
        "...sj,...s->...j", member, w_fine,
        precision=jax.lax.Precision.HIGHEST,
    )


def interlevel_loss(
    w_prop: jnp.ndarray, w_target: jnp.ndarray, eps: float = 1e-3
) -> jnp.ndarray:
    """One-sided histogram distillation loss (Mip-NeRF 360 eq. 13 shape,
    https://arxiv.org/pdf/2111.12077 — reshaped to our aligned-bin case).

    Penalizes the proposal only where it UNDER-covers the (detached) fine
    mass: excess proposal mass merely wastes a few fine samples on empty
    space, but missing mass starves the surface of them — the same
    asymmetry :func:`distill_proposal` applies offline.  The ``1/(w_prop
    + eps)`` weighting makes under-coverage of near-empty proposal bins
    expensive relative to slight under-coverage of already-heavy ones.

    Both inputs are per-ray bin histograms over the SAME partition
    (``w_target`` from :func:`binned_fine_weights`); callers detach
    ``w_target``.  Returns a scalar (sum over bins, mean over rays).
    """
    excess = jnp.maximum(w_target - w_prop, 0.0)
    return jnp.mean(jnp.sum(excess * excess / (w_prop + eps), axis=-1))


def distill_proposal(
    key: jax.Array,
    sigma_fn: Callable[[jnp.ndarray], jnp.ndarray],
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    near: float,
    far: float,
    *,
    l_xyz: int = 4,
    hidden: int = 64,
    depth: int = 3,
    steps: int = 1500,
    batch: int = 16384,
    lr: float = 2e-3,
    under_weight: float = 4.0,
) -> tuple[ProposalParams, float]:
    """Distill the trained model's density into the tiny proposal net.

    ``sigma_fn(pts (N, 3)) -> raw sigma logits (N,)`` — built by the
    Trainer from the FINE params (models/mlp.py:apply_nerf_sigma).
    Training points are sampled exactly where rendering will query:
    random (ray, t) pairs from the caller's representative rays
    (same calibration-ray contract as int8 quant) with t ~ U(near, far).
    Target is ``log1p(relu(sigma))`` — compresses the unbounded density
    range so the MSE is not dominated by the few enormous-sigma voxels;
    under-predictions are penalized ``under_weight``-fold (missing mass
    starves fine samples; excess mass only wastes them on empty space).

    The whole optimization is ONE jitted ``lax.scan`` — a single device
    dispatch (~seconds on v5e), no host loop.

    Returns ``(params, final_loss)``.
    """
    origins = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
    directions = jnp.asarray(directions, jnp.float32).reshape(-1, 3)
    n_rays = origins.shape[0]

    k_init, k_scan = jax.random.split(key)
    params = init_proposal(k_init, l_xyz=l_xyz, hidden=hidden, depth=depth)
    opt = optax.adam(lr)

    def loss_fn(p, pts, target):
        pred = apply_proposal(p, encode_position(pts, l_xyz))
        err = pred - target
        w = jnp.where(err < 0, under_weight, 1.0)
        return jnp.mean(w * err * err)

    def step(carry, k):
        p, opt_state = carry
        k_ray, k_t = jax.random.split(k)
        idx = jax.random.randint(k_ray, (batch,), 0, n_rays)
        t = jax.random.uniform(k_t, (batch,), jnp.float32, near, far)
        pts = origins[idx] + directions[idx] * t[:, None]
        target = jnp.log1p(jnp.maximum(sigma_fn(pts), 0.0))
        loss, grads = jax.value_and_grad(loss_fn)(p, pts, target)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(p, updates), opt_state), loss

    @jax.jit
    def run(p):
        (p, _), losses = jax.lax.scan(
            step, (p, opt.init(p)), jax.random.split(k_scan, steps)
        )
        return p, losses[-1]

    params, final_loss = run(params)
    return params, float(final_loss)


def make_chain_sampler(
    cfg,
    l_xyz: int,
    union: bool,
    levels: int,
    prop_samples: int,
    train: bool,
) -> Callable:
    """Build the proposal sampling chain shared by the online train step,
    the proposal eval step and every proposal render path.

    ``chain(pparams, origins, dirs, t_vals, key, step) ->
    (t_all, [(w_prop, t_partition), ...])`` — one ``(weights, partition)``
    pair per proposal level, in draw order.  Level 1 evaluates its net on
    the ``t_vals`` grid; with ``levels == 2`` (Mip-NeRF 360's stacked
    recipe, :func:`init_proposal_chain`) the second net re-bins at the
    UNION of the uniform grid and ``prop_samples`` stratified draws from
    the first histogram, so the final draw's placement resolution follows
    the mass where it is while the partition still covers all of
    ``[near, far]``.  ``t_all`` is the fine pass's sample positions
    (sorted union with ``t_vals`` when ``union``, else the sorted final
    draws alone).

    Two load-bearing intermediate-draw choices (the v1 chain without
    them trained BELOW the single level it refines — 22.07 vs 22.70 peak
    at seed 42, /tmp chain64_s42 run, round 4):

    * **grid union**: a draws-only partition can never cover space the
      first level abandoned — the level-2 exploration floor mixes over
      already-collapsed bins, so a transiently-wrong level 1 starves
      level 2 (and therefore the fine pass, and therefore its own
      distillation target) of whole regions, a self-reinforcing
      collapse.  Unioning the uniform grid restores the guaranteed
      coverage that makes the union fine-layout stable, at proposal
      (not fine-MLP) cost;
    * **stratified draws** (Mip-NeRF 360 draws every level stratified):
      iid uniforms leave random gaps/clumps in the partition that the
      next level inherits as resolution holes.

    ``train=True`` draws with the caller's PRNG key and shapes every draw
    with the sampling anneal + exploration floor (TRAINING draws only —
    config docstrings); ``train=False`` draws deterministically (midpoint
    u, no shaping) for reproducible eval/render.
    """
    n2 = prop_samples or cfg.ns_coarse

    def shape_draw(w, step):
        # The CDF draw always consumes detached weights (the proposal
        # chain learns from its distillation losses, never through the
        # clamped inverse-CDF interpolation — config validation requires
        # stop_pdf_gradient in proposal mode).
        w_draw = jax.lax.stop_gradient(w)
        if not train:
            return w_draw
        if cfg.prop_anneal_steps > 0:
            # Mip-NeRF 360 sampling anneal (draw-side only): soften the
            # draw by w^b, b = 10f/(1+9f) with f = step/N, so the first
            # steps draw near-uniformly and sharpen to the raw proposal
            # over PROP_ANNEAL_STEPS.  The +1e-5 floor keeps zero-weight
            # bins reachable at small b (0^b = 0 would pin them closed).
            f = jnp.clip(
                step.astype(jnp.float32) / cfg.prop_anneal_steps, 0.0, 1.0
            )
            b = 10.0 * f / (1.0 + 9.0 * f)
            w_draw = jnp.power(w_draw + 1e-5, b)
        if cfg.prop_explore > 0.0:
            # Exploration floor (TRAINING draw only): mix a uniform
            # fraction into the draw distribution so a momentarily
            # collapsed proposal can't starve whole regions of samples
            # (docs/PERF.md online-proposal section).  The LOSS still
            # sees the raw w_prop: exploration must not teach the
            # proposal to hedge.
            e = cfg.prop_explore
            w_draw = (1.0 - e) * w_draw + e * jnp.mean(
                w_draw, axis=-1, keepdims=True
            )
        return w_draw

    def chain(pparams, origins, dirs, t_vals, key, step):
        nets = chain_nets(pparams)
        if len(nets) != levels:
            raise ValueError(
                f"proposal params carry {len(nets)} level(s) but the "
                f"config says PROP_LEVELS={levels}"
            )
        level_outs = []
        t_part = t_vals
        t_all = None
        for i, net in enumerate(nets):
            w = proposal_weights(net, origins, dirs, t_part, l_xyz)
            level_outs.append((w, t_part))
            last = i == len(nets) - 1
            n_draw = cfg.ns_fine if last else n2
            t_mid = 0.5 * (t_part[..., 1:] + t_part[..., :-1])
            if train:
                key, sub = jax.random.split(key)
                t_draw = sample_pdf(
                    sub, t_mid, shape_draw(w, step), n_draw,
                    deterministic=False,
                    # intermediate draws form the next PARTITION:
                    # stratified, never iid (docstring)
                    stratified=not last,
                )
            else:
                t_draw = sample_pdf(
                    None, t_mid, shape_draw(w, step), n_draw,
                    deterministic=True,
                )
            if last:
                if union:
                    t_all = sorted_union(t_vals, t_draw)
                else:
                    # Mip-NeRF-360 layout: the fine net sees ONLY the
                    # placed samples (sorted for the compositing deltas).
                    t_all = jax.lax.sort(
                        t_draw, dimension=-1, is_stable=False
                    )
            else:
                # Next level's PARTITION: the refinement draws UNIONED
                # with the uniform grid — guaranteed [near, far]
                # coverage (docstring: a draws-only partition
                # self-reinforces collapse).
                t_part = sorted_union(t_vals, t_draw)
        return t_all, level_outs

    return chain
