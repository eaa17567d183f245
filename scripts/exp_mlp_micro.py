"""Microbenchmark: where does the fused MLP kernel's time go?

The fused forward kernel measures ~33 ms per 3.15M points vs a ~22 ms
padded-MXU floor.  This isolates the layers: a Pallas kernel with JUST
the eight 256x256 trunk matmuls (+relu), then variants adding the
63-wide input layer, the skip concat, and the sigma/feature/dir/rgb
heads — each measured standalone so the gap attributes to a specific
structure rather than "the kernel".

Usage: python scripts/exp_mlp_micro.py [--points 3145728] [--tile 4096]
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
    p.add_argument("--points", type=int, default=3145728)
    p.add_argument("--tiles", type=int, nargs="*", default=[2048, 4096])
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nerf_keras_tpu.ops.pallas.fused_mlp import _should_interpret
    from nerf_keras_tpu.utils.profiling import StepTimer, bench_scalar
    interp = _should_interpret()

    n = args.points
    rng = np.random.default_rng(0)
    timer = StepTimer(warmup=args.warmup, steps=args.steps)

    def dot(x, w):
        return jax.lax.dot_general(
            x, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def bench(name, fn, *xs, flops):
        bench_scalar(
            timer, name, fn, *xs, width=46,
            rate=lambda ms: f"({n / ms * 1e3 / 1e6:6.1f} Mpts/s, "
                            f"{flops / (ms * 1e-3) / 1e12:5.1f} TFLOP/s)")

    x256 = jnp.asarray(rng.normal(size=(n, 256)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    x63 = jnp.asarray(rng.normal(size=(n, 63)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    ws = [jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32) * 0.06
                      ).astype(jnp.bfloat16) for _ in range(8)]
    w1 = jnp.asarray(rng.normal(size=(63, 256)).astype(np.float32) * 0.12
                     ).astype(jnp.bfloat16)

    print(f"[exp] backend={jax.default_backend()} points={n}", flush=True)

    for tile in args.tiles:
        grid = n // tile

        # 1. pure trunk: eight 256x256 matmuls + relu
        def k_trunk(x_ref, *refs):
            o_ref = refs[-1]
            h = x_ref[:]
            for w_ref in refs[:-1]:
                h = jnp.maximum(dot(h, w_ref[:]), 0.0).astype(jnp.bfloat16)
            o_ref[:] = h

        def run_trunk(x, *w):
            return pl.pallas_call(
                k_trunk,
                grid=(grid,),
                in_specs=[pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)]
                + [pl.BlockSpec(wi.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for wi in w],
                out_specs=pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, 256), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=48 * 1024 * 1024),
                interpret=interp,
            )(x, *w)

        fl8 = n * 8 * 256 * 256 * 2
        bench(f"trunk 8x256 tile={tile}", run_trunk, x256, *ws, flops=fl8)

        # 1b. trunk, bf16 MXU output + compare-free bf16 relu:
        # relu(x) = (x + |x|) * 0.5 — v5e has no bf16 vector compare, but
        # abs is a sign-bit mask; skips the f32 intermediate and the cast.
        def k_trunk_b(x_ref, *refs):
            o_ref = refs[-1]
            h = x_ref[:]
            for w_ref in refs[:-1]:
                z = jax.lax.dot_general(
                    h, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.bfloat16,
                )
                h = (z + jnp.abs(z)) * jnp.bfloat16(0.5)
            o_ref[:] = h

        def run_trunk_b(x, *w):
            return pl.pallas_call(
                k_trunk_b,
                grid=(grid,),
                in_specs=[pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)]
                + [pl.BlockSpec(wi.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for wi in w],
                out_specs=pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, 256), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=48 * 1024 * 1024),
                interpret=interp,
            )(x, *w)

        bench(f"trunk bf16-out abs-relu tile={tile}", run_trunk_b, x256,
              *ws, flops=fl8)

        # 1c. software-pipelined halves: split the tile in two and
        # interleave their layers, so the scheduler can overlap half A's
        # VPU relu/cast with half B's MXU matmul (the plain chain's
        # strict dependency idles the MXU during every relu).
        for parts in (2, 4):
            if tile % parts:
                print(f"skip {parts}-way interleave: tile {tile} not "
                      f"divisible", flush=True)
                continue
            sub = tile // parts

            def k_trunk_p(x_ref, *refs, _parts=parts, _sub=sub):
                o_ref = refs[-1]
                hs = [x_ref[i * _sub:(i + 1) * _sub] for i in range(_parts)]
                for w_ref in refs[:-1]:
                    w = w_ref[:]
                    zs = [dot(h, w) for h in hs]
                    hs = [jnp.maximum(z, 0.0).astype(jnp.bfloat16)
                          for z in zs]
                for i, h in enumerate(hs):
                    o_ref[i * _sub:(i + 1) * _sub] = h

            def run_trunk_p(x, *w, _k=k_trunk_p):
                return pl.pallas_call(
                    _k,
                    grid=(grid,),
                    in_specs=[pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)]
                    + [pl.BlockSpec(wi.shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM) for wi in w],
                    out_specs=pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((n, 256), jnp.bfloat16),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=48 * 1024 * 1024),
                    interpret=interp,
                )(x, *w)

            bench(f"trunk {parts}-way interleaved tile={tile}", run_trunk_p,
                  x256, *ws, flops=fl8)

        # 2. trunk + 63-wide first layer (K pads to 128)
        def k_in63(x_ref, w1_ref, *refs):
            o_ref = refs[-1]
            h = jnp.maximum(dot(x_ref[:], w1_ref[:]), 0.0).astype(jnp.bfloat16)
            for w_ref in refs[:-1]:
                h = jnp.maximum(dot(h, w_ref[:]), 0.0).astype(jnp.bfloat16)
            o_ref[:] = h

        def run_in63(x, w_first, *w):
            return pl.pallas_call(
                k_in63,
                grid=(grid,),
                in_specs=[pl.BlockSpec((tile, 63), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(w_first.shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)]
                + [pl.BlockSpec(wi.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for wi in w],
                out_specs=pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, 256), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=48 * 1024 * 1024),
                interpret=interp,
            )(x, w_first, *w)

        bench(f"63-in + trunk 8x256 tile={tile}", run_in63, x63, w1, *ws,
              flops=fl8 + n * 63 * 256 * 2)

        # 3. trunk + skip concat at layer 4 (K=319 dot)
        wskip = jnp.asarray(
            rng.normal(size=(319, 256)).astype(np.float32) * 0.06
        ).astype(jnp.bfloat16)

        def k_skip(x_ref, xs_ref, wskip_ref, *refs):
            o_ref = refs[-1]
            h = x_ref[:]
            for li, w_ref in enumerate(refs[:-1]):
                if li == 4:
                    h = jnp.concatenate([h, xs_ref[:]], axis=-1)
                    h = jnp.maximum(dot(h, wskip_ref[:]), 0.0
                                    ).astype(jnp.bfloat16)
                else:
                    h = jnp.maximum(dot(h, w_ref[:]), 0.0
                                    ).astype(jnp.bfloat16)
            o_ref[:] = h

        def run_skip(x, xs, w_s, *w):
            return pl.pallas_call(
                k_skip,
                grid=(grid,),
                in_specs=[pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((tile, 63), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(w_s.shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)]
                + [pl.BlockSpec(wi.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for wi in w],
                out_specs=pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, 256), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=48 * 1024 * 1024),
                interpret=interp,
            )(x, xs, w_s, *w)

        bench(f"trunk + skip concat tile={tile}", run_skip, x256, x63,
              wskip, *ws, flops=fl8 + n * 63 * 256 * 2)

        # 4. skip via SPLIT dots (no concat): h@W_a + xs@W_b
        wa = wskip[:256]
        wb = wskip[256:]

        def k_split(x_ref, xs_ref, wa_ref, wb_ref, *refs):
            o_ref = refs[-1]
            h = x_ref[:]
            for li, w_ref in enumerate(refs[:-1]):
                if li == 4:
                    h = jnp.maximum(
                        dot(h, wa_ref[:]) + dot(xs_ref[:], wb_ref[:]), 0.0
                    ).astype(jnp.bfloat16)
                else:
                    h = jnp.maximum(dot(h, w_ref[:]), 0.0
                                    ).astype(jnp.bfloat16)
            o_ref[:] = h

        def run_split(x, xs, w_a, w_b, *w):
            return pl.pallas_call(
                k_split,
                grid=(grid,),
                in_specs=[pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((tile, 63), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(w_a.shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(w_b.shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)]
                + [pl.BlockSpec(wi.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for wi in w],
                out_specs=pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, 256), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=48 * 1024 * 1024),
                interpret=interp,
            )(x, xs, w_a, w_b, *w)

        bench(f"trunk + skip SPLIT dots tile={tile}", run_split, x256, x63,
              wa, wb, *ws, flops=fl8 + n * 63 * 256 * 2)


if __name__ == "__main__":
    sys.exit(main())
