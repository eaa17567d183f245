"""Same-process A/B of training-forward variants at flagship scale.

Tunnel throughput drifts run-to-run (2x observed), so cross-process
comparisons of ~10% effects are meaningless; this interleaves the jitted
full train steps (fwd+bwd+adam) for each variant inside one process:

  a) encodings-in fused kernels (apply_nerf_render_pallas; XLA computes
     points/encodings, kernel residuals keep them alive),
  b) raw-rays megakernel, residual bwd (fwd encodes in VMEM AND writes the
     encodings out; bwd is the encodings-in kernel — the hybrid), and
  c) raw-rays megakernel, recompute bwd (bwd re-encodes in VMEM).

Usage: python scripts/exp_train_paths.py [--batch 4096] [--steps 8]
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
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    import nerf_keras_tpu.engine.step as step_mod
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import init_train_state, make_train_step
    from nerf_keras_tpu.ops.pallas.fused_render import apply_nerf_render_pallas
    from nerf_keras_tpu.ops import encode_position, sample_rays
    from nerf_keras_tpu.utils.profiling import StepTimer

    b = args.batch
    cfg = NeRFConfig(
        batch_size=b, ns_coarse=64, ns_fine=128, num_layers=8,
        hidden_dim=256, skip_layer=4, l_xyz=10, l_dir=4,
        compute_dtype="bfloat16", use_pallas=True,
    ).validate()
    near, far = 2.0, 6.0

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (b, 1))
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = tuple(jax.device_put(x) for x in (images, origins, dirs))

    state = init_train_state(jax.random.PRNGKey(0), cfg)
    state = jax.device_put(state)

    # variant b (current code): raw-rays megakernel, residual bwd (hybrid)
    step_hyb = jax.jit(make_train_step(cfg, near, far))

    # variants c+: raw-rays megakernel with explicit kernel knobs
    from nerf_keras_tpu.ops.pallas.fused_render import render_rays_fused

    def make_fwd(**knobs):
        def fwd(params, key, ray_o, ray_d, t_vals):
            rgb_c, w_c = render_rays_fused(
                params["coarse"], ray_o, ray_d, t_vals,
                l_xyz=cfg.l_xyz, l_dir=cfg.l_dir, compute_dtype=jnp.bfloat16,
                skip_layer=cfg.skip_layer, **knobs)
            t_mid = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
            t_fine = sample_pdf(key, t_mid, jax.lax.stop_gradient(w_c),
                                cfg.ns_fine, deterministic=key is None)
            t_all = sorted_union(t_vals, t_fine)
            rgb_f, _ = render_rays_fused(
                params["fine"], ray_o, ray_d, t_all,
                l_xyz=cfg.l_xyz, l_dir=cfg.l_dir, compute_dtype=jnp.bfloat16,
                skip_layer=cfg.skip_layer, **knobs)
            return rgb_c, rgb_f

        return fwd

    fwd_recompute = make_fwd(bwd_mode="recompute")

    # variant a: encodings-in kernels — rebuild via a local forward that
    # mirrors the pre-round-2 _make_fused_train_forward
    from nerf_keras_tpu.ops.sampling import sample_pdf, sorted_union

    cdt = jnp.bfloat16

    def fwd_enc(params, key, ray_o, ray_d, t_vals):
        points, ds_ = sample_rays(ray_o, ray_d, t_vals)
        x_enc = encode_position(points, cfg.l_xyz).astype(cdt)
        d_enc = encode_position(ds_, cfg.l_dir).astype(cdt)
        rgb_c, w_c = apply_nerf_render_pallas(
            params["coarse"], x_enc, d_enc, t_vals,
            compute_dtype=cdt, skip_layer=cfg.skip_layer)
        t_mid = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        t_fine = sample_pdf(key, t_mid, jax.lax.stop_gradient(w_c),
                            cfg.ns_fine, deterministic=key is None)
        t_all = sorted_union(t_vals, t_fine)
        pf, df_ = sample_rays(ray_o, ray_d, t_all)
        xf = encode_position(pf, cfg.l_xyz).astype(cdt)
        df = encode_position(df_, cfg.l_dir).astype(cdt)
        rgb_f, _ = apply_nerf_render_pallas(
            params["fine"], xf, df, t_all,
            compute_dtype=cdt, skip_layer=cfg.skip_layer)
        return rgb_c, rgb_f

    orig = step_mod._make_fused_train_forward
    step_mod._make_fused_train_forward = lambda c, mesh=None: fwd_enc
    try:
        step_enc = jax.jit(make_train_step(cfg, near, far))
    finally:
        step_mod._make_fused_train_forward = orig

    step_mod._make_fused_train_forward = lambda c, mesh=None: fwd_recompute
    try:
        step_rec = jax.jit(make_train_step(cfg, near, far))
    finally:
        step_mod._make_fused_train_forward = orig

    extra_steps = []
    for bt in (2048, 3072):
        f = make_fwd(max_tile_bwd=bt)
        step_mod._make_fused_train_forward = lambda c, mesh=None, _f=f: _f
        try:
            extra_steps.append((f"bwd{bt}", jax.jit(make_train_step(cfg, near, far))))
        finally:
            step_mod._make_fused_train_forward = orig

    timer = StepTimer(warmup=args.warmup, steps=args.steps)
    key = jax.random.PRNGKey(7)

    def run(step, st):
        new_state, metrics = step(st, batch, key)
        return new_state, metrics["loss"]

    print(f"[exp] backend={jax.default_backend()} batch={b}", flush=True)
    for r in range(args.rounds):
        for tag, step in (("enc-in ", step_enc), ("hybrid ", step_hyb),
                          ("recomp ", step_rec), *extra_steps):
            holder = {"s": state}

            def one():
                holder["s"], loss = run(step, holder["s"])
                return loss

            stats = timer.measure(one)
            print(f"round {r} [{tag}] {stats['step_ms']:8.2f} ms "
                  f"({b / stats['step_ms'] * 1e3 / 1e3:6.1f} Krays/s)",
                  flush=True)


if __name__ == "__main__":
    sys.exit(main())
