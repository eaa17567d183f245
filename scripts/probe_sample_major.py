#!/usr/bin/env python
"""Probe the last untried Mosaic lever: SAMPLE-MAJOR layout movement via
explicit DMA (round-4 VERDICT #4).

Context: the fused render kernels move values between the flat per-point
layout ``(G*S, 1)`` (matmul rows) and the per-ray tile layout ``(G, S)``
(compositing) with exact one-hot SELECTOR matmuls, because Mosaic cannot
reshape across the sublane/lane boundary (ops/pallas/fused_render.py:92).
Those selectors cost MXU work — 3 bf16 limb dots per f32 movement for
exactness (the round-3 precision fix) — so "sample-major layouts / no
cross-lane reshape" stayed on the open list since round 3 with no
evidence either way.  This probe measures the ALTERNATIVE movement
mechanisms the toolchain offers on real hardware:

  A. ``selector_limb``  — the production 3-limb selector dot (baseline);
  B. ``reshape``        — in-kernel ``jnp.reshape`` across the boundary
                          (the historically blocked primitive);
  C. ``dma_rows``       — explicit per-ray sliced DMA
                          (``pltpu.make_async_copy`` of ``(S,)`` rows,
                          VMEM->VMEM — the "explicit DMA" variant);
  D. ``dma_bulk``       — one async copy between shape-mismatched refs
                          (compile-feasibility only).

Each variant implements ``(G*S, 1) f32 -> (G, S)`` followed by a per-ray
sum (so the movement cannot fold away), grid-iterated to a measurable
size.  Exactness is checked against numpy.  Results (or pinned compile
errors) go to docs/evidence/sample_major_probe.json and the PERF.md
still-open list.

Usage: python scripts/probe_sample_major.py  (on the TPU)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, S, STEPS = 8, 160, 512  # bwd-tile-like movement, repeated per grid
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(STEPS * G * S, 1)).astype(np.float32)
    want = x_np.reshape(STEPS, G, S).sum(-1)

    # 3-limb split constants (fused_render._SPLIT): top bf16 limb + two
    # residual limbs reconstruct f32 exactly through a bf16 dot.
    def limbs(v):
        l0 = v.astype(jnp.bfloat16)
        r0 = v - l0.astype(jnp.float32)
        l1 = r0.astype(jnp.bfloat16)
        r1 = r0 - l1.astype(jnp.float32)
        return l0, l1, r1.astype(jnp.bfloat16)

    sel_np = np.zeros((G, G * S), np.float32)  # A[g, g*S + s] = 1 picks row
    # one-hot GATHER per (g, s): tile[g, s] = flat[g*S + s]; realized as
    # S shifted one-hot dots folded into ONE (G, G*S) x (G*S, S) contract
    # equivalent — here we keep the production shape: At (G*S, G) with
    # tile = (A3limb @ diag-structured flat), emulated by the real
    # movement: for each s, selector S_s (G, G*S) with S_s[g, g*S+s]=1.
    # To keep the probe small we fold all s into a (G*S, S) "collect"
    # matrix C with C[g*S+s, s] = 1 and compute per-g row blocks.
    C_np = np.zeros((G * S, S), np.float32)
    for g in range(G):
        for s in range(S):
            C_np[g * S + s, s] = 1.0
    A_np = np.zeros((G, G * S), np.float32)
    for g in range(G):
        A_np[g, g * S: (g + 1) * S] = 1.0  # row-block mask

    results: dict = {
        "what": __doc__.split("\n")[0],
        "toolchain": {"jax": jax.__version__,
                      "jaxlib": getattr(__import__("jaxlib"), "__version__",
                                        "?"),
                      "backend": jax.default_backend(),
                      "device": str(jax.devices()[0])},
        "shape": {"G": G, "S": S, "steps": STEPS},
        "variants": {},
    }

    def run_variant(name, kernel, in_specs, extra_args=()):
        rec: dict = {}
        try:
            fn = pl.pallas_call(
                kernel,
                grid=(STEPS,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((STEPS * 8, 128), jnp.float32),
            )
            args = (jnp.asarray(x_np),) + tuple(extra_args)
            f = jax.jit(lambda *a: fn(*a))
            f_scalar = jax.jit(lambda *a: jnp.sum(fn(*a)))
            t0 = time.perf_counter()
            out = np.asarray(f(*args))
            rec["compile_plus_first_s"] = round(time.perf_counter() - t0, 2)
            err = float(np.abs(out[::8, :G] - want).max())
            rec["max_abs_err"] = err
            # timing: value-fetch sync (tunnel; block_until_ready lies)
            float(f_scalar(*args))  # compile the scalar-reduced form
            reps = 30
            t0 = time.perf_counter()
            for _ in range(reps):
                float(f_scalar(*args))
            rec["ms_per_call"] = round(
                (time.perf_counter() - t0) / reps * 1e3, 3)
            rec["ok"] = bool(err < 1e-5)
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"
            rec["traceback_tail"] = traceback.format_exc()[-800:]
            rec["ok"] = False
        results["variants"][name] = rec
        print(f"[probe] {name}: "
              f"{rec.get('ms_per_call', rec.get('error'))}", flush=True)

    x_spec = pl.BlockSpec((G * S, 1), lambda i: (i, 0))

    # A. production-style selector movement (3 bf16 limb dots)
    def kern_selector(x_ref, c_ref, a_ref, out_ref):
        x = x_ref[:]                      # (G*S, 1)
        rows = x * c_ref[:]               # (G*S, S) one-hot-masked
        l0, l1, l2 = limbs(rows)
        a3 = a_ref[:]
        tile = (jnp.dot(a3, l0, preferred_element_type=jnp.float32)
                + jnp.dot(a3, l1, preferred_element_type=jnp.float32)
                + jnp.dot(a3, l2, preferred_element_type=jnp.float32))
        out_ref[:] = jnp.pad(jnp.sum(tile, axis=-1)[None, :],
                             ((0, 7), (0, 128 - G)))

    run_variant(
        "selector_limb", kern_selector,
        [x_spec, pl.BlockSpec((G * S, S), lambda i: (0, 0)),
         pl.BlockSpec((G, G * S), lambda i: (0, 0))],
        extra_args=(jnp.asarray(C_np), jnp.asarray(A_np, jnp.bfloat16)),
    )

    # B. in-kernel cross-boundary reshape
    def kern_reshape(x_ref, out_ref):
        tile = x_ref[:].reshape(G, S)
        out_ref[:] = jnp.pad(jnp.sum(tile, axis=-1)[None, :],
                             ((0, 7), (0, 128 - G)))

    run_variant("reshape", kern_reshape, [x_spec])

    # C. explicit per-ray sliced DMA into a (G, S) scratch
    def kern_dma_rows(x_ref, out_ref, scratch, sem):
        for g in range(G):
            pltpu.make_async_copy(
                x_ref.at[pl.ds(g * S, S), 0],
                scratch.at[g, pl.ds(0, S)],
                sem,
            ).start()
        # one semaphore, G signals: wait G times
        for g in range(G):
            pltpu.make_async_copy(
                x_ref.at[pl.ds(g * S, S), 0],
                scratch.at[g, pl.ds(0, S)],
                sem,
            ).wait()
        out_ref[:] = jnp.pad(jnp.sum(scratch[:], axis=-1)[None, :],
                             ((0, 7), (0, 128 - G)))

    def run_dma_rows():
        rec: dict = {}
        try:
            fn = pl.pallas_call(
                kern_dma_rows,
                grid=(STEPS,),
                in_specs=[x_spec],
                out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((STEPS * 8, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((G, S), jnp.float32),
                                pltpu.SemaphoreType.DMA],
            )
            f = jax.jit(lambda a: fn(a))
            t0 = time.perf_counter()
            out = np.asarray(f(jnp.asarray(x_np)))
            rec["compile_plus_first_s"] = round(time.perf_counter() - t0, 2)
            err = float(np.abs(out[::8, :G] - want).max())
            rec["max_abs_err"] = err
            reps = 20
            t0 = time.perf_counter()
            for _ in range(reps):
                float(np.asarray(f(jnp.asarray(x_np)))[0, 0])
            rec["ms_per_call"] = round(
                (time.perf_counter() - t0) / reps * 1e3, 3)
            rec["ok"] = bool(err < 1e-5)
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"
            rec["traceback_tail"] = traceback.format_exc()[-800:]
            rec["ok"] = False
        results["variants"]["dma_rows"] = rec
        print(f"[probe] dma_rows: "
              f"{rec.get('ms_per_call', rec.get('error'))}", flush=True)

    run_dma_rows()

    # D. one bulk DMA between shape-mismatched refs (feasibility only)
    def kern_dma_bulk(x_ref, out_ref, scratch, sem):
        dma = pltpu.make_async_copy(x_ref, scratch, sem)
        dma.start()
        dma.wait()
        out_ref[:] = jnp.pad(jnp.sum(scratch[:], axis=-1)[None, :],
                             ((0, 7), (0, 128 - G)))

    def run_dma_bulk():
        rec: dict = {}
        try:
            fn = pl.pallas_call(
                kern_dma_bulk,
                grid=(STEPS,),
                in_specs=[x_spec],
                out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((STEPS * 8, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((G, S), jnp.float32),
                                pltpu.SemaphoreType.DMA],
            )
            out = np.asarray(jax.jit(lambda a: fn(a))(jnp.asarray(x_np)))
            err = float(np.abs(out[::8, :G] - want).max())
            rec["max_abs_err"] = err
            rec["ok"] = bool(err < 1e-5)
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"
            rec["ok"] = False
        results["variants"]["dma_bulk"] = rec
        print(f"[probe] dma_bulk: "
              f"{'ok' if rec['ok'] else rec.get('error', '?')[:120]}",
              flush=True)

    run_dma_bulk()

    out_path = os.path.join(REPO, "docs", "evidence",
                            "sample_major_probe.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[probe] wrote {out_path}", flush=True)



def expand_probe() -> None:
    """Variant E: the EXPAND direction — per-ray (G, D) vectors repeated
    to per-sample rows (G*S, D).  Production uses the At selector matmul
    (3 limb dots for f32 exactness); the alternative is broadcast +
    cross-boundary reshape, which carries values EXACTLY (no arithmetic)
    if Mosaic accepts it."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    G, S, D, STEPS = 8, 160, 128, 512
    rng = np.random.default_rng(1)
    v_np = rng.normal(size=(STEPS * G, D)).astype(np.float32)
    want_sum = np.repeat(v_np.reshape(STEPS, G, D), S, axis=1).sum(
        axis=(1, 2))

    def kern_expand_reshape(v_ref, out_ref):
        v = v_ref[:]                                   # (G, D)
        exp = jnp.broadcast_to(v[:, None, :], (G, S, D)).reshape(G * S, D)
        out_ref[:] = jnp.pad(
            jnp.sum(exp)[None, None], ((0, 7), (0, 127)))

    rec = {}
    try:
        fn = pl.pallas_call(
            kern_expand_reshape,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((G, D), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((STEPS * 8, 128), jnp.float32),
        )
        f = jax.jit(lambda a: fn(a))
        f_scalar = jax.jit(lambda a: jnp.sum(fn(a)[::8, 0]))
        import time as _t

        t0 = _t.perf_counter()
        out = np.asarray(f(jnp.asarray(v_np)))
        rec["compile_plus_first_s"] = round(_t.perf_counter() - t0, 2)
        err = float(np.abs(out[::8, 0] - want_sum).max()
                    / max(1.0, np.abs(want_sum).max()))
        rec["max_rel_err"] = err
        float(f_scalar(jnp.asarray(v_np)))
        reps = 30
        t0 = _t.perf_counter()
        for _ in range(reps):
            float(f_scalar(jnp.asarray(v_np)))
        rec["ms_per_call"] = round((_t.perf_counter() - t0) / reps * 1e3, 3)
        rec["ok"] = bool(err < 1e-4)
    except Exception as e:
        rec["error"] = f"{type(e).__name__}: {e}"
        rec["ok"] = False
    print(f"[probe] expand_reshape: "
          f"{rec.get('ms_per_call', rec.get('error'))}", flush=True)
    import json as _json

    path = os.path.join(REPO, "docs", "evidence", "sample_major_probe.json")
    d = _json.load(open(path))
    d["variants"]["expand_reshape"] = rec
    _json.dump(d, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
    expand_probe()
