"""Round-3 backward-kernel experiment sweep (real TPU).

Three phases, all interleaved in one process (tunnel throughput drifts
run-to-run, so cross-process A/Bs of ~10% effects are meaningless):

  micro  — matmul orientation microbenchmark: the backward's dW
           contractions run in the TN orientation (contract over the
           sublane/T axis of BOTH operands); if Mosaic relayouts the
           transposed operand per matmul, a transposed-walk redesign pays.
           Times 16-deep dependency chains of (T,256)x(T,256)->(256,256)
           contractions in TN vs NN (pre-transposed lhs operand) vs NT.
  bwd    — ray-tile sweep of the real residual-mode backward at the
           flagship fine shape (B=4096, S=192) now that the blocked
           selectors make tile cost linear in R (old quadratic selector
           cost is why round 2 capped at 8-ray tiles / 512 grid steps).
  fwd    — same sweep for the forward megakernel.
  step   — full train step at the best tile combo (override via args).

Usage: python scripts/exp_bwd_r3.py [--phases micro,bwd,fwd,step]
           [--bwd-tiles 1536,3072,4608,6144] [--fwd-tiles 3072,6144]
           [--step-bwd-tile N] [--step-fwd-tile N]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--phases", type=str, default="micro,bwd,fwd,step")
    p.add_argument("--bwd-tiles", type=str, default="1536,3072,4608,6144")
    p.add_argument("--fwd-tiles", type=str, default="3072,6144,9216")
    p.add_argument("--step-bwd-tile", type=int, default=None)
    p.add_argument("--step-fwd-tile", type=int, default=None)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()
    phases = set(args.phases.split(","))

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import nerf_keras_tpu.ops.pallas.fused_render as fr
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import init_train_state, make_train_step
    from nerf_keras_tpu.utils.profiling import StepTimer

    b = args.batch
    cfg = NeRFConfig(
        batch_size=b, ns_coarse=64, ns_fine=128, num_layers=8,
        hidden_dim=256, skip_layer=4, l_xyz=10, l_dir=4,
        compute_dtype="bfloat16", use_pallas=True,
    ).validate()
    timer = StepTimer(warmup=args.warmup, steps=args.steps)
    print(f"[exp_bwd_r3] backend={jax.default_backend()} batch={b}",
          flush=True)

    rng = np.random.default_rng(0)
    origins = jnp.asarray(
        np.tile(np.array([0, 0, 4.0], np.float32), (b, 1)))
    d = rng.normal(size=(b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)

    def t_sorted(s):
        base = np.linspace(2.0, 6.0, s, dtype=np.float32)
        jit_ = rng.uniform(0, 4.0 / s, size=(b, s)).astype(np.float32)
        return jnp.asarray(np.sort(base[None, :] + jit_, axis=-1))

    t_fine = t_sorted(192)
    t_coarse = t_sorted(64)

    state = jax.device_put(init_train_state(jax.random.PRNGKey(0), cfg))
    params_fine = state.params["fine"]

    def measure(name, fn, *xs):
        jitted = jax.jit(fn)
        try:
            stats = timer.measure(lambda: jitted(*xs))
        except Exception as e:  # noqa: BLE001
            print(f"{name:44s}   FAILED {type(e).__name__}: "
                  f"{(str(e).splitlines() or [repr(e)])[0][:110]}",
                  flush=True)
            return None
        print(f"{name:44s} {stats['step_ms']:8.2f} ms "
              f"(rtt {stats['fetch_rtt_ms']:.1f})", flush=True)
        return stats["step_ms"]

    # ---------------- phase: micro (matmul orientation) ----------------
    if "micro" in phases:
        T, iters, grid = 1536, 16, 128
        flops = 2 * T * 256 * 256 * iters * grid

        def mk_kernel(orient):
            def kern(x_ref, xt_ref, o_ref):
                y = x_ref[:]
                yt = xt_ref[:]
                for _ in range(iters):
                    if orient == "tn":
                        m = jax.lax.dot_general(
                            y, y, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    elif orient == "nn":
                        m = jax.lax.dot_general(
                            yt, y, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    else:  # nt
                        m = jax.lax.dot_general(
                            yt, yt, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    sc = (jnp.sum(m) * 1e-20).astype(jnp.bfloat16)
                    y = y + sc
                    yt = yt + sc
                o_ref[:] = (jnp.sum(y.astype(jnp.float32))
                            + jnp.sum(yt.astype(jnp.float32))
                            ) * jnp.ones((8, 128), jnp.float32)
            return kern

        x = jnp.asarray(rng.normal(size=(T, 256)), jnp.bfloat16)
        xt = jnp.asarray(np.ascontiguousarray(np.asarray(x).T))

        def run_orient(orient):
            def f(x, xt):
                out = pl.pallas_call(
                    mk_kernel(orient),
                    grid=(grid,),
                    in_specs=[
                        pl.BlockSpec((T, 256), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((256, T), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                )(x, xt)
                return jnp.sum(out)
            return f

        for orient in ("nn", "tn", "nt"):
            ms = measure(f"micro {orient} (T={T} K-contract chains)",
                         run_orient(orient), x, xt)
            if ms:
                print(f"    -> {flops / (ms * 1e-3) / 1e12:.1f} TFLOP/s "
                      f"effective", flush=True)

    # ---------------- phase: bwd tile sweep ----------------
    if "bwd" in phases:
        def mk_grad(mt, s_tag, t_vals):
            def f(p, o, d, t):
                def loss(pp):
                    rgb, _ = fr.render_rays_fused(
                        pp, o, d, t, l_xyz=10, l_dir=4,
                        compute_dtype=jnp.bfloat16, skip_layer=4,
                        max_tile_bwd=mt)
                    return jnp.sum(rgb)
                g = jax.grad(loss)(p)
                acc = jnp.zeros((), jnp.float32)
                for leaf in jax.tree_util.tree_leaves(g):
                    acc = acc + jnp.sum(leaf.astype(jnp.float32))
                return acc
            return f

        fwd_ms = measure(
            "fwd-only fine S=192 (default tile)",
            lambda p, o, d, t: jnp.sum(fr.render_rays_fused(
                p, o, d, t, l_xyz=10, l_dir=4,
                compute_dtype=jnp.bfloat16, skip_layer=4)[0]),
            params_fine, origins, dirs, t_fine)
        for mt in [int(x) for x in args.bwd_tiles.split(",")]:
            r = fr._rays_per_tile(192, mt)
            ms = measure(
                f"fwd+bwd fine S=192 bwd_tile={mt} (r={r})",
                mk_grad(mt, "fine", t_fine),
                params_fine, origins, dirs, t_fine)
            if ms and fwd_ms:
                print(f"    -> bwd alone ~{ms - fwd_ms:.2f} ms", flush=True)

    # ---------------- phase: fwd tile sweep ----------------
    if "fwd" in phases:
        def mk_fwd(mt):
            def f(p, o, d, t):
                rgb, _ = fr.render_rays_fused(
                    p, o, d, t, l_xyz=10, l_dir=4,
                    compute_dtype=jnp.bfloat16, skip_layer=4,
                    max_tile_fwd=mt)
                return jnp.sum(rgb)
            return f

        for mt in [int(x) for x in args.fwd_tiles.split(",")]:
            r = fr._rays_per_tile(192, mt)
            measure(f"fwd fine S=192 fwd_tile={mt} (r={r})",
                    mk_fwd(mt), params_fine, origins, dirs, t_fine)

    # ---------------- phase: full train step ----------------
    if "step" in phases:
        if args.step_bwd_tile or args.step_fwd_tile:
            # Defaults come from the per-S measured table; override it.
            orig = fr._default_tiles

            def patched(s, _orig=orig):
                f, b_ = _orig(s)
                return (args.step_fwd_tile or f, args.step_bwd_tile or b_)

            fr._default_tiles = patched
        images = jnp.asarray(rng.uniform(0, 1, (b, 3)), jnp.float32)
        batch = (images, origins, dirs)
        step = jax.jit(make_train_step(cfg, 2.0, 6.0))
        key = jax.random.PRNGKey(7)
        holder = {"s": state}

        def one():
            holder["s"], metrics = step(holder["s"], batch, key)
            return metrics["loss"]

        stats = timer.measure(one)
        ms = stats["step_ms"]
        print(f"train step (fwd_tile={args.step_fwd_tile or 'table'} "
              f"bwd_tile={args.step_bwd_tile or 'table'}) {ms:8.2f} ms "
              f"({b / ms:,.0f} Krays/s /1000)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
