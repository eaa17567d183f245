"""Tile sweep at the r3e OFFICIAL train shape (union 64+96 -> S=160).

The measured ray-tile table (fused_render._default_tiles) was swept at
S=192 (fwd r=16, bwd r=8); the official step now composites 160 union
samples, so re-check the optimum at the shipped shape.  Same-process,
best-of-rounds (tunnel drift rule, docs/PERF.md).

Usage: python scripts/exp_tiles_160.py [--batch 4096]
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
    p.add_argument("--samples", type=int, default=160)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    import nerf_keras_tpu.ops.pallas.fused_render as fr
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import init_train_state
    from nerf_keras_tpu.utils.profiling import StepTimer, bench_scalar

    b, s = args.batch, args.samples
    timer = StepTimer(warmup=2, steps=args.steps)
    print(f"[tiles160] backend={jax.default_backend()} batch={b} S={s}",
          flush=True)

    cfg = NeRFConfig(
        batch_size=b, ns_coarse=min(64, s // 2), ns_fine=s - min(64, s // 2),
        num_layers=8,
        hidden_dim=256, skip_layer=4, l_xyz=10, l_dir=4,
        compute_dtype="bfloat16", use_pallas=True,
        train_sampler="proposal",
    ).validate()
    state = jax.device_put(init_train_state(jax.random.PRNGKey(0), cfg))
    pf = state.params["fine"]

    rng = np.random.default_rng(0)
    origins = jnp.asarray(np.tile(np.array([0, 0, 4.0], np.float32), (b, 1)))
    d = rng.normal(size=(b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)
    base = np.linspace(2.0, 6.0, s, dtype=np.float32)
    jit_ = rng.uniform(0, 4.0 / s, size=(b, s)).astype(np.float32)
    t = jnp.asarray(np.sort(base[None, :] + jit_, axis=-1))

    def fwd(mt):
        def f(p, o, d_, tv):
            rgb, _ = fr.render_rays_fused(
                p, o, d_, tv, l_xyz=10, l_dir=4,
                compute_dtype=jnp.bfloat16, skip_layer=4, max_tile_fwd=mt)
            return jnp.sum(rgb)
        return f

    def fwdbwd(mt_fwd, mt_bwd):
        def f(p, o, d_, tv):
            def loss(pp):
                rgb, _ = fr.render_rays_fused(
                    pp, o, d_, tv, l_xyz=10, l_dir=4,
                    compute_dtype=jnp.bfloat16, skip_layer=4,
                    max_tile_fwd=mt_fwd, max_tile_bwd=mt_bwd)
                return jnp.sum(rgb)
            g = jax.grad(loss)(p)
            acc = jnp.zeros((), jnp.float32)
            for leaf in jax.tree_util.tree_leaves(g):
                acc = acc + jnp.sum(leaf.astype(jnp.float32))
            return acc
        return f

    for r in (8, 16, 32):
        bench_scalar(timer, f"fwd S={s} r={r}", fwd(r * s),
                     pf, origins, dirs, t)
    # Full fwd x bwd grid: the combined optimum need not pair the
    # standalone-fwd winner with the standalone-bwd winner (review
    # finding on the original fwd_r=16-only sweep).
    for r_fwd in (8, 16):
        for r_bwd in (8, 16):
            bench_scalar(timer, f"fwd+bwd S={s} fwd_r={r_fwd} bwd_r={r_bwd}",
                         fwdbwd(r_fwd * s, r_bwd * s), pf, origins, dirs, t)


if __name__ == "__main__":
    sys.exit(main())
