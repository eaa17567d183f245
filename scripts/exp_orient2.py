"""Realistic matmul-orientation microbench for the backward redesign.

exp_bwd_r3's micro showed TN (the dW orientation: contract both operands
over the sublane/T axis) at 45 TFLOP/s vs NT 69 on chained 256-wide
contractions.  This script measures the REAL kernel shapes:

  fwd_nn / fwd_nt — activation chain h = relu(h @ W) with stationary
      256x256 weights: canonical NN vs NT (transposed weights, contract
      lanes-lanes).  Candidate speedup for every forward/recompute/dx dot.
  dw_tn / dw_nt   — the dW accumulation: TN on (T, 256) operands vs NT on
      pre-transposed (256, T) operands (what a transposed backward walk
      would produce).
  transp          — the cost of an explicit (T, 256) <-> (256, T) Mosaic
      transpose, i.e. the price of entering the transposed layout.

Usage: python scripts/exp_orient2.py [--t 1536] [--iters 16] [--grid 128]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=1536)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--grid", type=int, default=128)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nerf_keras_tpu.utils.profiling import StepTimer

    T, iters, grid = args.t, args.iters, args.grid
    timer = StepTimer(warmup=2, steps=args.steps)
    rng = np.random.default_rng(0)
    f32 = jnp.float32

    x = jnp.asarray(rng.normal(size=(T, 256)) * 0.1, jnp.bfloat16)
    xt = jnp.asarray(np.ascontiguousarray(np.asarray(x, np.float32).T),
                     jnp.bfloat16)
    ws = jnp.asarray(rng.normal(size=(8, 256, 256)) * 0.05, jnp.bfloat16)
    wts = jnp.swapaxes(ws, 1, 2)

    flops = 2 * T * 256 * 256 * iters * grid

    def measure(name, kern, *ops):
        def const_map(ndim):
            return lambda i, _n=ndim: (0,) * _n

        in_specs = [
            pl.BlockSpec(o.shape, const_map(o.ndim),
                         memory_space=pltpu.VMEM)
            for o in ops
        ]
        fn = jax.jit(lambda *a: jnp.sum(pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), f32),
        )(*a)))
        try:
            stats = timer.measure(lambda: fn(*ops))
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s}  FAILED {type(e).__name__}: "
                  f"{(str(e).splitlines() or [''])[0][:110]}", flush=True)
            return
        ms = stats["step_ms"]
        print(f"{name:24s} {ms:8.2f} ms   {flops / (ms * 1e-3) / 1e12:6.1f}"
              f" TFLOP/s", flush=True)

    # --- forward-style chains: h = relu(h @ W), stationary weights ---
    def fwd_nn(x_ref, w_ref, o_ref):
        h = x_ref[:]
        for i in range(iters):
            m = jax.lax.dot_general(
                h, w_ref[i % 8], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            h = jnp.maximum(m, 0.0).astype(jnp.bfloat16)
        o_ref[:] = jnp.sum(h.astype(f32)) * jnp.ones((8, 128), f32)

    def fwd_nt(x_ref, wt_ref, o_ref):
        h = x_ref[:]
        for i in range(iters):
            m = jax.lax.dot_general(
                h, wt_ref[i % 8], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            h = jnp.maximum(m, 0.0).astype(jnp.bfloat16)
        o_ref[:] = jnp.sum(h.astype(f32)) * jnp.ones((8, 128), f32)

    # --- dW-style chains ---
    def dw_tn(x_ref, o_ref):
        h = x_ref[:]
        acc = jnp.zeros((256, 256), f32)
        for _ in range(iters):
            m = jax.lax.dot_general(
                x_ref[:], h, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            acc = acc + m
            h = (h.astype(f32) * (1.0 + 1e-9 * m[:1, :])).astype(jnp.bfloat16)
        o_ref[:] = jnp.sum(acc) * jnp.ones((8, 128), f32)

    def dw_nt(xt_ref, o_ref):
        ht = xt_ref[:]
        acc = jnp.zeros((256, 256), f32)
        for _ in range(iters):
            m = jax.lax.dot_general(
                xt_ref[:], ht, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            acc = acc + m
            ht = (ht.astype(f32) * (1.0 + 1e-9 * m[:, :1])).astype(jnp.bfloat16)
        o_ref[:] = jnp.sum(acc) * jnp.ones((8, 128), f32)

    # --- explicit transpose round-trips ---
    def transp(x_ref, o_ref):
        h = x_ref[:]
        for i in range(iters // 2):
            ht = jnp.swapaxes(h, 0, 1)
            h = jnp.swapaxes(ht + jnp.bfloat16(1e-6), 0, 1)
        o_ref[:] = jnp.sum(h.astype(f32)) * jnp.ones((8, 128), f32)

    print(f"[exp_orient2] backend={jax.default_backend()} T={T} "
          f"iters={iters} grid={grid}", flush=True)
    measure("fwd_nn (h @ W)", fwd_nn, x, ws)
    measure("fwd_nt (h @ Wt')", fwd_nt, x, wts)
    measure("dw_tn (xT @ h)", dw_tn, x)
    measure("dw_nt (xt @ ht')", dw_nt, xt)
    measure(f"transp x{iters} (no mm)", transp, x)


if __name__ == "__main__":
    sys.exit(main())
