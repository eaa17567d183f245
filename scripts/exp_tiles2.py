"""Follow-up tile sweep: small-tile hypothesis for fwd and the coarse pass.

exp_bwd_r3 found the fine BACKWARD fastest at the minimum 8-ray tile
(19.5 ms vs 23.9 at r=16) — small tiles pipeline the streaming operands
better.  This sweep tests the same hypothesis on the fine FORWARD (r=8
never measured) and the coarse pass (never swept), then times the full
train step at the best combination.

Usage: python scripts/exp_tiles2.py
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
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    import nerf_keras_tpu.ops.pallas.fused_render as fr
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import init_train_state, make_train_step
    from nerf_keras_tpu.utils.profiling import StepTimer, bench_scalar

    b = args.batch
    timer = StepTimer(warmup=2, steps=args.steps)
    print(f"[exp_tiles2] backend={jax.default_backend()} batch={b}",
          flush=True)

    cfg = NeRFConfig(
        batch_size=b, ns_coarse=64, ns_fine=128, num_layers=8,
        hidden_dim=256, skip_layer=4, l_xyz=10, l_dir=4,
        compute_dtype="bfloat16", use_pallas=True,
    ).validate()
    state = jax.device_put(init_train_state(jax.random.PRNGKey(0), cfg))

    rng = np.random.default_rng(0)
    origins = jnp.asarray(np.tile(np.array([0, 0, 4.0], np.float32), (b, 1)))
    d = rng.normal(size=(b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)

    def t_sorted(s):
        base = np.linspace(2.0, 6.0, s, dtype=np.float32)
        jit_ = rng.uniform(0, 4.0 / s, size=(b, s)).astype(np.float32)
        return jnp.asarray(np.sort(base[None, :] + jit_, axis=-1))

    t_fine, t_coarse = t_sorted(192), t_sorted(64)
    pf = state.params["fine"]
    pc = state.params["coarse"]

    def fwd(mt):
        def f(p, o, d, t):
            rgb, _ = fr.render_rays_fused(
                p, o, d, t, l_xyz=10, l_dir=4,
                compute_dtype=jnp.bfloat16, skip_layer=4, max_tile_fwd=mt)
            return jnp.sum(rgb)
        return f

    def grad_fn(mt_bwd):
        def f(p, o, d, t):
            def loss(pp):
                rgb, _ = fr.render_rays_fused(
                    pp, o, d, t, l_xyz=10, l_dir=4,
                    compute_dtype=jnp.bfloat16, skip_layer=4,
                    max_tile_bwd=mt_bwd)
                return jnp.sum(rgb)
            g = jax.grad(loss)(p)
            acc = jnp.zeros((), jnp.float32)
            for leaf in jax.tree_util.tree_leaves(g):
                acc = acc + jnp.sum(leaf.astype(jnp.float32))
            return acc
        return f

    # fine fwd small-tile check (r=16 was 12.3 ms; r=8 untested)
    for mt in (1536, 3072):
        r = fr._rays_per_tile(192, mt)
        bench_scalar(timer, f"fwd fine S=192 tile={mt} (r={r})",
                     fwd(mt), pf, origins, dirs, t_fine)
    # coarse fwd sweep (default 4096 -> r=64)
    for mt in (1024, 2048, 4096):
        r = fr._rays_per_tile(64, mt)
        bench_scalar(timer, f"fwd coarse S=64 tile={mt} (r={r})",
                     fwd(mt), pc, origins, dirs, t_coarse)
    # coarse fwd+bwd sweep (default bwd 1024 -> r=16)
    for mt in (512, 1024, 2048):
        r = fr._rays_per_tile(64, mt)
        bench_scalar(timer, f"fwd+bwd coarse S=64 bwd_tile={mt} (r={r})",
                     grad_fn(mt), pc, origins, dirs, t_coarse)

    # full step at defaults for the session's drift reference
    images = jnp.asarray(rng.uniform(0, 1, (b, 3)), jnp.float32)
    batch = (images, origins, dirs)
    step = jax.jit(make_train_step(cfg, 2.0, 6.0))
    key = jax.random.PRNGKey(7)
    holder = {"s": state}

    def one():
        holder["s"], metrics = step(holder["s"], batch, key)
        return metrics["loss"]

    stats = timer.measure(one)
    print(f"train step (defaults) {stats['step_ms']:8.2f} ms "
          f"({b / stats['step_ms']:7.1f} Krays/s /1000)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
