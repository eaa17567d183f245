"""Train-step breakdown on the live backend (fused Pallas path).

Splits the flagship train step (bench.py workload) into forward-only,
forward+backward, optimizer, and the XLA glue pieces, each jitted and
timed standalone — so kernel-vs-glue attribution is measured.  Components
overlap (the step pipelines them), so the parts can sum past the whole;
the value is in the ratios and in what moves after a change.

Usage:
    python scripts/profile_train.py [--batch 4096] [--steps 20]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--xla", action="store_true", help="jnp path instead of Pallas")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import (
        _make_fused_train_forward,
        init_train_state,
        make_optimizer,
        make_train_step,
        mse,
    )
    from nerf_keras_tpu.ops import (
        encode_position,
        generate_t_vals,
        sample_pdf,
        sample_rays,
        sorted_union,
    )
    from nerf_keras_tpu.utils.profiling import StepTimer, bench_scalar

    use_pallas = not args.xla and jax.default_backend() == "tpu"
    cfg = NeRFConfig(
        batch_size=args.batch, ns_coarse=64, ns_fine=128,
        num_layers=8, hidden_dim=256, compute_dtype="bfloat16",
        use_pallas=use_pallas,
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
    origins = jax.device_put(np.tile(np.array([0, 0, 4.0], np.float32), (b, 1)))
    key = jax.random.PRNGKey(1)

    timer = StepTimer(warmup=args.warmup, steps=args.steps)

    def bench(name, fn, *xs):
        return bench_scalar(timer, name, fn, *xs, width=36)

    print(f"[profile] backend={jax.default_backend()} batch={b} "
          f"pallas={use_pallas}", flush=True)

    # 1. the full step.  Consume the WHOLE new state, not just the loss —
    # returning only the loss lets XLA dead-code-eliminate the backward
    # and Adam (measured: 14.8 ms vs the real 40 ms step).
    step = make_train_step(cfg, near, far)
    st = jax.device_put(state)

    def full_step_consumed(s, im, o, d, k):
        new_state, metrics = step(s, (im, o, d), k)
        acc = metrics["loss"]
        for leaf in jax.tree_util.tree_leaves(new_state.params):
            acc = acc + jnp.sum(leaf).astype(jnp.float32)
        return acc

    full = bench("full train step", full_step_consumed,
                 st, images, origins, dirs, key)

    # 2. forward-only loss value
    fwd = _make_fused_train_forward(cfg) if use_pallas else None
    tv = generate_t_vals(jax.random.PRNGKey(2), near, far, (b,), cfg.ns_coarse,
                         cfg.sampling_mode)
    tv = jax.device_put(np.asarray(tv))

    if use_pallas:
        def loss_fn(params, k, o, d, t, im):
            rc, rf = fwd(params, k, o, d, t)
            return mse(im, rc) + mse(im, rf)

        f_ms = bench("loss forward only", loss_fn,
                     state.params, key, origins, dirs, tv, images)

        # 3. forward + backward (no optimizer).  Every grad leaf feeds the
        # scalar output — anything unused would be DCE'd out of the timing.
        def vag(pr, k, o, d, t, im):
            v, g = jax.value_and_grad(loss_fn)(pr, k, o, d, t, im)
            for leaf in jax.tree_util.tree_leaves(g):
                v = v + jnp.sum(leaf).astype(jnp.float32)
            return v

        g_ms = bench("value+grad (no adam)", vag,
                     state.params, key, origins, dirs, tv, images)

        # 4. adam alone on real-shaped grads (all updated leaves consumed)
        grads = jax.jit(jax.grad(loss_fn))(state.params, key, origins, dirs,
                                           tv, images)

        def adam(g, os_, pr):
            import optax

            up, _ = optimizer.update(g, os_, pr)
            new = optax.apply_updates(pr, up)
            acc = jnp.zeros((), jnp.float32)
            for leaf in jax.tree_util.tree_leaves(new):
                acc = acc + jnp.sum(leaf).astype(jnp.float32)
            return acc

        bench("adam update alone", adam, grads, state.opt_state, state.params)
        if None not in (f_ms, g_ms, full):
            print(f"[profile] backward-only ~= {g_ms - f_ms:.2f} ms, "
                  f"step-minus-grad ~= {full - g_ms:.2f} ms", flush=True)
        else:
            print("[profile] derived numbers skipped (a component FAILED)",
                  flush=True)

    # 4b. fused kernels standalone at train scale
    if use_pallas:
        from nerf_keras_tpu.ops.pallas.fused_render import (
            apply_nerf_render_pallas,
        )

        def enc_for(t):
            pts, ds_ = sample_rays(origins, dirs, t)
            return (encode_position(pts, cfg.l_xyz).astype(jnp.bfloat16),
                    encode_position(ds_, cfg.l_dir).astype(jnp.bfloat16))

        tvc = jax.device_put(np.asarray(generate_t_vals(
            None, near, far, (b,), cfg.ns_coarse, "center")))
        s_all = cfg.ns_coarse + cfg.ns_fine
        tva = jax.device_put(np.broadcast_to(
            np.linspace(near, far, s_all, dtype=np.float32), (b, s_all)).copy())
        xc, dc = jax.jit(enc_for)(tvc)
        xa, da = jax.jit(enc_for)(tva)

        def fused_fwd(pr, x, d, t):
            return apply_nerf_render_pallas(
                pr, x.reshape(b, t.shape[-1], -1), d.reshape(b, t.shape[-1], -1),
                t, compute_dtype=jnp.bfloat16, skip_layer=cfg.skip_layer)[0]

        bench("fused fwd kernel coarse (B,64)", fused_fwd,
              state.params["coarse"], xc, dc, tvc)
        bench("fused fwd kernel fine (B,192)", fused_fwd,
              state.params["fine"], xa, da, tva)

        def fused_grad(pr, x, d, t, im):
            def lf(p):
                rgb = apply_nerf_render_pallas(
                    p, x.reshape(b, t.shape[-1], -1),
                    d.reshape(b, t.shape[-1], -1), t,
                    compute_dtype=jnp.bfloat16, skip_layer=cfg.skip_layer)[0]
                return mse(im, rgb)

            v, g = jax.value_and_grad(lf)(pr)
            for leaf in jax.tree_util.tree_leaves(g):
                v = v + jnp.sum(leaf).astype(jnp.float32)
            return v

        bench("fused fwd+bwd kernel fine only", fused_grad,
              state.params["fine"], xa, da, tva, images)

    # 5. glue standalone
    bench("generate_t_vals", lambda k: generate_t_vals(
        k, near, far, (b,), cfg.ns_coarse, cfg.sampling_mode), key)

    w = jax.device_put(rng.uniform(0, 1, (b, cfg.ns_coarse)).astype(np.float32))

    def pdf_union(k, t, wts):
        t_mid = 0.5 * (t[..., 1:] + t[..., :-1])
        t_fine = sample_pdf(k, t_mid, wts, cfg.ns_fine)
        return sorted_union(t, t_fine)

    t_all = jax.jit(pdf_union)(key, tv, w)
    bench("sample_pdf + sorted_union", pdf_union, key, tv, w)

    def enc(o, d, t):
        pts, ds_ = sample_rays(o, d, t)
        return (encode_position(pts, cfg.l_xyz).astype(jnp.bfloat16),
                encode_position(ds_, cfg.l_dir).astype(jnp.bfloat16))

    bench("encode coarse (B,64)", lambda o, d, t: enc(o, d, t)[0],
          origins, dirs, tv)
    bench("encode fine (B,192)", lambda o, d, t: enc(o, d, t)[0],
          origins, dirs, t_all)


if __name__ == "__main__":
    sys.exit(main())
