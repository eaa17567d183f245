"""Same-process A/B: round-2 kernels vs round-3 kernels, full train step.

Cross-session step timings drift up to 2x on the shared tunnel, so the
only trustworthy comparison interleaves both variants' jitted steps in
ONE process.  The round-2 kernels are extracted from git (commit c16f894)
into an import-shimmed module dir (default /tmp/oldk — see the round-3
session notes; recreate with `git show c16f894:...`).

Usage: python scripts/exp_ab_r2r3.py [--oldk /tmp/oldk] [--rounds 3]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--oldk", type=str, default="/tmp/oldk")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args()
    sys.path.insert(0, args.oldk)

    import jax
    import jax.numpy as jnp

    import nerf_keras_tpu.engine.step as step_mod
    import old_fused_render  # noqa: E402  (the shimmed round-2 module)
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import init_train_state, make_train_step
    from nerf_keras_tpu.ops.sampling import sample_pdf, sorted_union
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

    state = jax.device_put(init_train_state(jax.random.PRNGKey(0), cfg))

    step_new = jax.jit(make_train_step(cfg, near, far))

    def fwd_old(params, key, ray_o, ray_d, t_vals):
        rgb_c, w_c = old_fused_render.render_rays_fused(
            params["coarse"], ray_o, ray_d, t_vals,
            l_xyz=cfg.l_xyz, l_dir=cfg.l_dir, compute_dtype=jnp.bfloat16,
            skip_layer=cfg.skip_layer)
        t_mid = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        t_fine = sample_pdf(key, t_mid, jax.lax.stop_gradient(w_c),
                            cfg.ns_fine, deterministic=key is None)
        t_all = sorted_union(t_vals, t_fine)
        rgb_f, _ = old_fused_render.render_rays_fused(
            params["fine"], ray_o, ray_d, t_all,
            l_xyz=cfg.l_xyz, l_dir=cfg.l_dir, compute_dtype=jnp.bfloat16,
            skip_layer=cfg.skip_layer)
        return rgb_c, rgb_f

    orig = step_mod._make_fused_train_forward
    step_mod._make_fused_train_forward = lambda c, mesh=None: fwd_old
    try:
        step_old = jax.jit(make_train_step(cfg, near, far))
    finally:
        step_mod._make_fused_train_forward = orig

    timer = StepTimer(warmup=args.warmup, steps=args.steps)
    key = jax.random.PRNGKey(7)
    print(f"[ab_r2r3] backend={jax.default_backend()} batch={b}", flush=True)
    for r in range(args.rounds):
        for tag, step in (("r2-old", step_old), ("r3-new", step_new)):
            holder = {"s": state}

            def one():
                holder["s"], metrics = step(holder["s"], batch, key)
                return metrics["loss"]

            stats = timer.measure(one)
            ms = stats["step_ms"]
            print(f"round {r} [{tag}] {ms:8.2f} ms "
                  f"({b / ms:7.1f} Krays/s /1000)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
