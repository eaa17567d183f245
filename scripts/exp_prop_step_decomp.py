"""Decompose the OFFICIAL online-proposal (union) train step on the live TPU.

The official bench (bench.py default since commit 7a4ea9c) is the
TRAIN_SAMPLER='proposal' union step at flagship shapes.  This probe times,
same-process (the only methodology that survives the tunnel's +-8% drift,
docs/PERF.md round-3):

  1. the full proposal (union) train step, fully consumed;
  2. the fine megakernel fwd and fwd+bwd standalone at 192 union samples
     (the step's dominant component);
  3. every XLA glue piece standalone: proposal-net chain, sample_pdf,
     sorted_union, binned target + interlevel loss, Adam;
  4. candidate replacement: rank-merge of the two ALREADY-SORTED sample
     lists via positional scatter (vs lax.sort over 192) — both lists are
     monotone (bin centers by construction; inverse-CDF of stratified u),
     so merged position of each value is its own rank + the count of the
     other list strictly below it.

Standalone pieces overlap inside the fused step, so parts can sum past
the whole; ratios and deltas are what matter.

Usage: python scripts/exp_prop_step_decomp.py [--batch 4096] [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def merged_by_rank(t_vals, t_fine):
    """Union of two per-ray ASCENDING lists without a sort.

    position(a_i) = i + |{j : b_j < a_i}| (strict on one side, non-strict
    on the other, so ties interleave deterministically).  The counts are
    one (B, Na, Nb) comparison reduce each; the scatter into the merged
    row is a one-hot matmul (MXU) like sample_pdf's selects.
    """
    import jax
    import jax.numpy as jnp

    na = t_vals.shape[-1]
    nb = t_fine.shape[-1]
    n = na + nb
    # counts: for each a_i, how many b_j < a_i (strict); for each b_j,
    # how many a_i <= b_j (non-strict) — disjoint merged positions.
    lt = (t_fine[..., None, :] < t_vals[..., :, None]).sum(-1)   # (B, Na)
    le = (t_vals[..., None, :] <= t_fine[..., :, None]).sum(-1)  # (B, Nb)
    pos_a = jnp.arange(na, dtype=jnp.int32) + lt.astype(jnp.int32)
    pos_b = jnp.arange(nb, dtype=jnp.int32) + le.astype(jnp.int32)
    slots = jnp.arange(n, dtype=jnp.int32)
    oh_a = (pos_a[..., :, None] == slots).astype(t_vals.dtype)  # (B, Na, N)
    oh_b = (pos_b[..., :, None] == slots).astype(t_vals.dtype)
    return (
        jnp.einsum("bi,bin->bn", t_vals, oh_a,
                   precision=jax.lax.Precision.HIGHEST)
        + jnp.einsum("bi,bin->bn", t_fine, oh_b,
                     precision=jax.lax.Precision.HIGHEST)
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--ns-fine", type=int, default=128,
                   help="placed fine samples (96 = the r3e official budget)")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import (
        _make_pass_fn,
        init_train_state,
        make_optimizer,
        make_train_step,
        mse,
    )
    from nerf_keras_tpu.ops import generate_t_vals, sample_pdf, sorted_union
    from nerf_keras_tpu.ops.proposal import (
        binned_fine_weights,
        interlevel_loss,
        proposal_weights,
    )
    from nerf_keras_tpu.utils.profiling import StepTimer, bench_scalar

    use_pallas = jax.default_backend() == "tpu"
    arch = dict(
        ns_coarse=64, ns_fine=args.ns_fine, num_layers=8, hidden_dim=256,
        l_xyz=10, l_dir=4, skip_layer=4,
        compute_dtype="bfloat16" if use_pallas else "float32",
        use_pallas=use_pallas, stop_pdf_gradient=True,
    )
    cfg = NeRFConfig(
        batch_size=args.batch, train_sampler="proposal",
        prop_anneal_steps=10_000, **arch,
    ).validate()
    near, far = 2.0, 6.0
    b = args.batch
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(cfg)

    rng = np.random.default_rng(0)
    images = jax.device_put(rng.uniform(0, 1, (b, 3)).astype(np.float32))
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jax.device_put(dirs)
    origins = jax.device_put(
        np.tile(np.array([0, 0, 4.0], np.float32), (b, 1)))
    key = jax.random.PRNGKey(1)

    timer = StepTimer(warmup=args.warmup, steps=args.steps)
    results = {}

    def bench(name, fn, *xs):
        ms = bench_scalar(timer, name, fn, *xs, width=40)
        results[name] = ms
        return ms

    print(f"[decomp] backend={jax.default_backend()} batch={b} "
          f"pallas={use_pallas}", flush=True)

    # 1. the full official step, consumed
    step = make_train_step(cfg, near, far)
    st = jax.device_put(state)

    def full_step_consumed(s, im, o, d, k):
        new_state, metrics = step(s, (im, o, d), k)
        acc = metrics["loss"]
        for leaf in jax.tree_util.tree_leaves(new_state.params):
            acc = acc + jnp.sum(leaf).astype(jnp.float32)
        return acc

    full = bench("full proposal step (union)", full_step_consumed,
                 st, images, origins, dirs, key)

    # 2. fine megakernel at 192 union samples, fwd and fwd+bwd
    fine_pass = _make_pass_fn(cfg)
    t_union = jax.device_put(np.sort(
        rng.uniform(near, far, (b, cfg.ns_coarse + cfg.ns_fine))
    ).astype(np.float32))

    def fine_fwd(pr, o, d, t):
        rgb, _ = fine_pass(pr, o, d, t)
        return jnp.sum(rgb).astype(jnp.float32)

    bench(f"fine kernel fwd @{cfg.ns_coarse + cfg.ns_fine}", fine_fwd,
          state.params["fine"], origins, dirs, t_union)

    def fine_vag(pr, o, d, t, im):
        def lf(p):
            rgb, _ = fine_pass(p, o, d, t)
            return mse(im, rgb)

        v, g = jax.value_and_grad(lf)(pr)
        for leaf in jax.tree_util.tree_leaves(g):
            v = v + jnp.sum(leaf).astype(jnp.float32)
        return v

    fine_full = bench(f"fine kernel fwd+bwd @{cfg.ns_coarse + cfg.ns_fine}", fine_vag,
                      state.params["fine"], origins, dirs, t_union, images)

    # 3. glue standalone
    t_vals = jax.device_put(np.asarray(generate_t_vals(
        jax.random.PRNGKey(2), near, far, (b,), cfg.ns_coarse,
        cfg.sampling_mode)))

    def prop_chain_fwd(pp, o, d, t):
        w = proposal_weights(pp, o, d, t, cfg.prop_l_xyz)
        return jnp.sum(w).astype(jnp.float32)

    bench("proposal net fwd", prop_chain_fwd,
          state.params["proposal"], origins, dirs, t_vals)

    w_prop = jax.jit(
        lambda pp: proposal_weights(pp, origins, dirs, t_vals, cfg.prop_l_xyz)
    )(state.params["proposal"])
    w_prop = jax.block_until_ready(w_prop)

    def pdf_only(k, t, w):
        t_mid = 0.5 * (t[..., 1:] + t[..., :-1])
        return jnp.sum(sample_pdf(k, t_mid, w, cfg.ns_fine)).astype(
            jnp.float32)

    bench(f"sample_pdf 64->{cfg.ns_fine}", pdf_only, key, t_vals, w_prop)

    t_fine = jax.jit(
        lambda k, t, w: sample_pdf(
            k, 0.5 * (t[..., 1:] + t[..., :-1]), w, cfg.ns_fine)
    )(key, t_vals, w_prop)
    t_fine = jax.block_until_ready(t_fine)

    bench(f"sorted_union (lax.sort {cfg.ns_coarse + cfg.ns_fine})",
          lambda a, c: jnp.sum(sorted_union(a, c)).astype(jnp.float32),
          t_vals, t_fine)
    bench(f"lax.sort {cfg.ns_fine} (union-free path)",
          lambda c: jnp.sum(jax.lax.sort(
              c, dimension=-1, is_stable=False)).astype(jnp.float32),
          t_fine)
    # Candidate precondition: t_fine sorted BY CONSTRUCTION (stratified-u
    # draw in sample_pdf — jaxnerf/Mip-NeRF's randomized mode — instead
    # of iid u + downstream sort).  Then the union needs no sort at all.
    t_fine_sorted = jax.device_put(np.sort(np.asarray(t_fine), axis=-1))
    bench("merged_by_rank (one-hot MXU)",
          lambda a, c: jnp.sum(merged_by_rank(a, c)).astype(jnp.float32),
          t_vals, t_fine_sorted)

    # correctness of the candidate on sorted inputs
    ref = np.sort(np.concatenate(
        [np.asarray(t_vals), np.asarray(t_fine_sorted)], axis=-1), axis=-1)
    got = np.asarray(jax.jit(merged_by_rank)(t_vals, t_fine_sorted))
    merge_err = float(np.max(np.abs(ref - got)))
    print(f"[decomp] merged_by_rank max |err| vs sort = {merge_err:.3e}",
          flush=True)
    results["merge_err"] = merge_err

    w_fine = jax.jit(
        lambda pr: fine_pass(pr, origins, dirs, t_union)[1]
    )(state.params["fine"])
    w_fine = jax.block_until_ready(w_fine)

    def target_and_loss(t_a, w_f, t_c, w_p):
        tgt = binned_fine_weights(t_a, jax.lax.stop_gradient(w_f), t_c)
        return interlevel_loss(w_p, tgt).astype(jnp.float32)

    bench("binned target + interlevel loss", target_and_loss,
          t_union, w_fine, t_vals, w_prop)

    # Adam on real-shaped grads
    def loss_for_grads(pr, k, o, d, t, im):
        rgb, _ = fine_pass(pr["fine"], o, d, t)
        wp = proposal_weights(pr["proposal"], o, d, t_vals, cfg.prop_l_xyz)
        return mse(im, rgb) + 1e-3 * jnp.sum(wp ** 2)

    grads = jax.jit(jax.grad(loss_for_grads))(
        state.params, key, origins, dirs, t_union, images)
    grads = jax.block_until_ready(grads)

    def adam(g, os_, pr):
        import optax

        up, _ = optimizer.update(g, os_, pr)
        new = optax.apply_updates(pr, up)
        acc = jnp.zeros((), jnp.float32)
        for leaf in jax.tree_util.tree_leaves(new):
            acc = acc + jnp.sum(leaf).astype(jnp.float32)
        return acc

    bench("adam update alone", adam, grads, state.opt_state, state.params)

    if full and fine_full:
        print(f"[decomp] step-minus-fine-kernel ~= {full - fine_full:.2f} ms "
              "(glue + proposal chain + adam, overlapped)", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"[decomp] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
