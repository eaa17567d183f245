"""Forward-only kernel shootout at render-chunk scale (live backend).

Re-tests VERDICT's render hypothesis with proper on-device scalar sync:
XLA-path MLP vs the Pallas MLP kernel vs the fused MLP+composite kernel,
at several forward tile sizes.  The XLA path is activation-HBM-bound
(each of the 8 (N,256) layer outputs round-trips HBM); the Pallas kernels
keep activations in VMEM, so forward-only SHOULD win too — the round-1
"XLA wins forward" measurement was made through whole-frame timings with
per-chunk host dispatches and big-array fetches, not component-level.

Usage: python scripts/exp_fwd_kernels.py [--rays 16384] [--samples 192]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=16384)
    p.add_argument("--samples", type=int, default=192)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.models.mlp import apply_nerf_mlp, init_nerf_params
    from nerf_keras_tpu.ops import encode_position, sample_rays
    from nerf_keras_tpu.ops.pallas.fused_mlp import apply_nerf_mlp_pallas
    from nerf_keras_tpu.ops.pallas.fused_render import apply_nerf_render_pallas
    from nerf_keras_tpu.utils.profiling import StepTimer, bench_scalar

    b, s = args.rays, args.samples
    cfg = NeRFConfig(
        batch_size=b, ns_coarse=64, ns_fine=128, num_layers=8,
        hidden_dim=256, compute_dtype="bfloat16", use_pallas=False,
    ).validate()
    params = init_nerf_params(
        jax.random.PRNGKey(0), num_layers=8, hidden_dim=256,
        skip_layer=4, l_xyz=10, l_dir=4,
    )

    rng = np.random.default_rng(0)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (b, 1))
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    tv = np.broadcast_to(
        np.linspace(2.0, 6.0, s, dtype=np.float32), (b, s)
    ).copy()

    pts, ds_ = sample_rays(jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(tv))
    x_enc = jax.device_put(encode_position(pts, cfg.l_xyz).astype(jnp.bfloat16))
    d_enc = jax.device_put(encode_position(ds_, cfg.l_dir).astype(jnp.bfloat16))
    t_dev = jax.device_put(tv)

    timer = StepTimer(warmup=args.warmup, steps=args.steps)
    npts = b * s

    def bench(name, fn, *xs):
        return bench_scalar(
            timer, name, fn, *xs,
            rate=lambda ms: f"({npts / ms * 1e3 / 1e6:7.1f} Mpts/s)")

    print(f"[exp] backend={jax.default_backend()} rays={b} samples={s} "
          f"points={npts}", flush=True)

    bench("xla mlp (jnp path)",
          lambda pr, x, d: apply_nerf_mlp(
              pr, x, d, compute_dtype=jnp.bfloat16, skip_layer=4)[0],
          params, x_enc, d_enc)

    for tile in (2048, 4096, 8192):
        bench(f"pallas mlp fwd tile={tile}",
              lambda pr, x, d, _t=tile: apply_nerf_mlp_pallas(
                  pr, x, d, compute_dtype=jnp.bfloat16, skip_layer=4,
                  tile=_t, need_input_grads=False),
              params, x_enc, d_enc)

    for tile in (4096, 8192, 16384):
        bench(f"pallas fused render fwd tile={tile}",
              lambda pr, x, d, t, _t=tile: apply_nerf_render_pallas(
                  pr, x.reshape(b, s, -1), d.reshape(b, s, -1), t,
                  compute_dtype=jnp.bfloat16, skip_layer=4,
                  max_tile_fwd=_t)[0],
              params, x_enc, d_enc, t_dev)

    # Raw-rays megakernel: per-tile operands are (R,3)/(R,S), so bigger
    # tiles don't inflate input DMA the way the encodings-in kernel's do —
    # only the f32 selector/encode constants grow.
    from nerf_keras_tpu.ops.pallas.fused_render import render_rays_fused

    o_dev = jax.device_put(origins)
    dir_dev = jax.device_put(dirs)
    for tile in (2048, 4096, 6144, 8192, 12288):
        bench(f"megakernel (raw rays) tile={tile}",
              lambda pr, o, d, t, _t=tile: render_rays_fused(
                  pr, o, d, t, l_xyz=10, l_dir=4,
                  compute_dtype=jnp.bfloat16, skip_layer=4,
                  max_tile_fwd=_t)[0],
              params, o_dev, dir_dev, t_dev)


if __name__ == "__main__":
    sys.exit(main())
