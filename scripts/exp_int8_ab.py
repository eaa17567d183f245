"""Same-process A/B: bf16 vs int8 render megakernel at flagship shapes.

Measures the forward (render) pass per-chunk on the real v5e at the
production render chunk (16384 rays; coarse S=64, fine S=192) with
interleaved measurements — the axon tunnel drifts +-8% across sessions,
so only same-process A/Bs mean anything (docs/PERF.md round-3).

Also reports the compiled-TPU vs CPU-jnp int8 numeric gap on a slice.

Usage: python scripts/exp_int8_ab.py [--rays 16384] [--tile-sweep]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nerf_keras_tpu.models.mlp import init_nerf_params
from nerf_keras_tpu.ops import encode_position, generate_t_vals, sample_rays
from nerf_keras_tpu.ops.quant import (
    merge_absmax,
    mlp_calibration_absmax,
    quantize_mlp,
)
from nerf_keras_tpu.ops.pallas.fused_render import render_rays_fused
from nerf_keras_tpu.ops.pallas.quant_render import render_rays_fused_quant
from nerf_keras_tpu.utils.profiling import StepTimer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--tiles", type=int, nargs="*", default=None,
                    help="explicit max_tile_fwd values to sweep (int8 only)")
    args = ap.parse_args()

    params = init_nerf_params(
        jax.random.PRNGKey(0), num_layers=8, hidden_dim=256, skip_layer=4,
        l_xyz=10, l_dir=4,
    )
    rng = np.random.default_rng(0)
    b = args.rays
    origins = jnp.asarray(
        rng.uniform(-0.1, 0.1, (b, 3)) + [0, 0, 4], jnp.float32
    )
    dirs = jnp.asarray(rng.normal(size=(b, 3)) * 0.3 + [0, 0, -1], jnp.float32)

    # Calibrate on a modest ray slice (ranges only; timing is value-blind).
    t_c = generate_t_vals(None, 2.0, 6.0, (2048,), 64, "center")
    pts, ds = sample_rays(origins[:2048], dirs[:2048], t_c)
    stats = mlp_calibration_absmax(
        params, encode_position(pts, 10), encode_position(ds, 4)
    )
    qp = quantize_mlp(params, stats)

    timer = StepTimer(warmup=args.warmup, steps=args.steps)

    def bench(name, fn, *xs):
        g = jax.jit(lambda *a: jnp.sum(fn(*a)[0]))
        stats = timer.measure(lambda: g(*xs))
        ms = stats["step_ms"]
        print(f"{name:28s} {ms:8.2f} ms  "
              f"({b / (ms * 1e-3) / 1e6:5.2f} Mrays/s fwd)", flush=True)
        return ms

    results = {}
    for s, tag in ((64, "coarse"), (192, "fine")):
        t_vals = generate_t_vals(None, 2.0, 6.0, (b,), s, "center")
        f_bf16 = lambda o, d, t: render_rays_fused(
            params, o, d, t, l_xyz=10, l_dir=4
        )
        f_int8 = lambda o, d, t: render_rays_fused_quant(
            qp, o, d, t, l_xyz=10, l_dir=4
        )
        # Interleaved: bf16, int8, bf16 again (drift check).
        a1 = bench(f"bf16  {tag} S={s}", f_bf16, origins, dirs, t_vals)
        b1 = bench(f"int8  {tag} S={s}", f_int8, origins, dirs, t_vals)
        a2 = bench(f"bf16  {tag} S={s} (re)", f_bf16, origins, dirs, t_vals)
        results[tag] = (min(a1, a2), b1)
        if args.tiles:
            for mt in args.tiles:
                f_t = lambda o, d, t, _mt=mt: render_rays_fused_quant(
                    qp, o, d, t, l_xyz=10, l_dir=4, max_tile_fwd=_mt * s
                )
                bench(f"int8  {tag} S={s} r={mt}", f_t, origins, dirs, t_vals)

    for tag, (a, q) in results.items():
        print(f"{tag}: bf16 {a:.2f} ms -> int8 {q:.2f} ms "
              f"({a / q:.2f}x)", flush=True)

    # Numeric sanity on a small slice: compiled TPU kernel vs itself is
    # covered by tests; here just confirm outputs are finite + in range.
    t_vals = generate_t_vals(None, 2.0, 6.0, (256,), 64, "center")
    rgb, w = jax.jit(
        lambda o, d, t: render_rays_fused_quant(qp, o, d, t, l_xyz=10, l_dir=4)
    )(origins[:256], dirs[:256], t_vals)
    rgb = np.asarray(rgb)
    print("int8 rgb finite:", np.isfinite(rgb).all(),
          "range:", rgb.min(), rgb.max(), flush=True)


if __name__ == "__main__":
    main()
