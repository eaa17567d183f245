"""Render-path breakdown on the live backend.

Times the chunked forward render (the 800x800 frame hot loop,
engine/step.py:make_render_fn) and its components standalone at one chunk
scale, so the glue-vs-MLP split is measured, not guessed.  Each component
is jitted separately; sync is by scalar fetch (StepTimer) because
block_until_ready returns early on the axon tunnel.

Usage:
    python scripts/profile_render.py [--chunk 16384] [--steps 5]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=16384)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--ab", action="store_true",
                   help="A/B the full render chunk: jnp path vs fused kernel "
                        "path, same process, interleaved")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import init_train_state, make_render_fn
    from nerf_keras_tpu.models.mlp import apply_nerf_mlp
    from nerf_keras_tpu.ops import (
        encode_position,
        generate_t_vals,
        sample_pdf,
        sample_rays,
        sorted_union,
        volume_render,
    )
    from nerf_keras_tpu.utils.profiling import StepTimer, bench_scalar

    cfg = NeRFConfig(
        batch_size=args.chunk, ns_coarse=64, ns_fine=128,
        num_layers=8, hidden_dim=256, compute_dtype="bfloat16",
        use_pallas=False,
    ).validate()
    near, far = 2.0, 6.0
    b, sc, sf = args.chunk, cfg.ns_coarse, cfg.ns_coarse + cfg.ns_fine
    state = init_train_state(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (b, 1))
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o_dev, d_dev = jax.device_put(origins), jax.device_put(dirs)

    timer = StepTimer(warmup=args.warmup, steps=args.steps)

    def bench(name, fn, *xs):
        return bench_scalar(timer, name, fn, *xs, width=36)

    print(f"[profile] backend={jax.default_backend()} chunk={b} "
          f"samples={sc}+{cfg.ns_fine}", flush=True)

    # --- the real thing ---
    render = make_render_fn(cfg, near, far)

    def render_frame_equiv(s, o, d):
        r = render(s, o, d)
        # rgb + depth consumed — what the frame renderer actually fetches
        return jnp.sum(r["rgb_fine"]) + jnp.sum(r["depth_fine"])

    total = bench("full render chunk (jnp)", render_frame_equiv,
                  state, o_dev, d_dev)

    if args.ab:
        import dataclasses

        cfg_p = dataclasses.replace(cfg, use_pallas=True)
        render_p = make_render_fn(cfg_p, near, far)

        def render_fused_equiv(s, o, d):
            r = render_p(s, o, d)
            return jnp.sum(r["rgb_fine"]) + jnp.sum(r["depth_fine"])

        # Interleave: tunnel speed drifts run to run — alternate the two
        # compiled programs inside one process for a fair comparison.
        jit_j = jax.jit(render_frame_equiv)
        jit_p = jax.jit(render_fused_equiv)
        for tag, f in (("jnp", jit_j), ("fused", jit_p)) * 3:
            stats = timer.measure(lambda: f(state, o_dev, d_dev))
            print(f"A/B full render chunk [{tag:5s}] {stats['step_ms']:8.2f} ms",
                  flush=True)
        return

    # --- components ---
    tv = generate_t_vals(None, near, far, (b,), sc, "center")
    tv = jax.device_put(np.asarray(tv))

    def enc(o, d, t):
        pts, ds_ = sample_rays(o, d, t)
        return (encode_position(pts, cfg.l_xyz).astype(jnp.bfloat16),
                encode_position(ds_, cfg.l_dir).astype(jnp.bfloat16))

    x_c, d_c = jax.jit(lambda o, d, t: enc(o, d, t))(o_dev, d_dev, tv)
    bench("encode coarse (B,64)", lambda o, d, t: enc(o, d, t)[0], o_dev, d_dev, tv)

    def mlp_c(params, x, d):
        out, _ = apply_nerf_mlp(params, x, d, compute_dtype=jnp.bfloat16,
                                skip_layer=cfg.skip_layer)
        return out

    preds_c = jax.jit(mlp_c)(state.params["coarse"], x_c, d_c)
    bench("mlp coarse (B*64)", mlp_c, state.params["coarse"], x_c, d_c)
    bench("volume_render coarse", lambda p, t: volume_render(p, t)[0], preds_c, tv)

    w_c = jax.jit(lambda p, t: volume_render(p, t)[2])(preds_c, tv)

    def pdf_sort(t, w):
        t_mid = 0.5 * (t[..., 1:] + t[..., :-1])
        t_fine = sample_pdf(None, t_mid, w, cfg.ns_fine, deterministic=True)
        return sorted_union(t, t_fine)

    t_all = jax.jit(pdf_sort)(tv, w_c)
    bench("sample_pdf + sorted_union", pdf_sort, tv, w_c)

    x_f, d_f = jax.jit(lambda o, d, t: enc(o, d, t))(o_dev, d_dev, t_all)
    bench("encode fine (B,192)", lambda o, d, t: enc(o, d, t)[0], o_dev, d_dev, t_all)
    preds_f = jax.jit(mlp_c)(state.params["fine"], x_f, d_f)
    bench("mlp fine (B*192)", mlp_c, state.params["fine"], x_f, d_f)
    bench("volume_render fine", lambda p, t: volume_render(p, t)[0], preds_f, t_all)

    n_frame = 800 * 800
    if total is None:
        print("[profile] full-chunk bench FAILED; no frame estimate",
              flush=True)
        return
    print(f"[profile] full-chunk total {total:.2f} ms -> "
          f"{total * (n_frame / b) / 1e3:.2f} s per 800x800 frame-equivalent",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
