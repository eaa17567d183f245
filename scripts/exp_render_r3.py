"""Round-3 render-path measurement (real TPU).

Phases:
  pdf    — standalone: fused pdf+union kernel vs the XLA
           sample_pdf+sorted_union chain at the render-chunk shape.
  chunk  — one compiled 16384-ray eval chunk (coarse+pdf+fine) before/
           after: the fused-eval forward now uses the kernel.
  frame  — 800x800 frame via trainer.render_image, best of N (logged).

Usage: python scripts/exp_render_r3.py [--phases pdf,chunk,frame]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--phases", type=str, default="pdf,chunk,frame")
    p.add_argument("--chunk", type=int, default=16384)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()
    phases = set(args.phases.split(","))
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.ops import sample_pdf, sorted_union
    from experimental.pdf_union import sample_pdf_union_eval
    from nerf_keras_tpu.utils.profiling import StepTimer, bench_scalar

    timer = StepTimer(warmup=2, steps=args.steps)
    n = args.chunk
    print(f"[exp_render_r3] backend={jax.default_backend()} chunk={n}",
          flush=True)

    rng = np.random.default_rng(0)
    t = jnp.asarray(
        np.sort(rng.uniform(2.0, 6.0, (n, 64)).astype(np.float32), axis=-1))
    w = jnp.asarray(rng.uniform(0, 1, (n, 64)).astype(np.float32) ** 3)

    if "pdf" in phases:
        def xla_chain(t, w):
            t_mid = 0.5 * (t[..., 1:] + t[..., :-1])
            t_fine = sample_pdf(None, t_mid, w, 128, deterministic=True)
            return sorted_union(t, t_fine)

        bench_scalar(timer, f"XLA pdf+union  (B={n})", xla_chain, t, w)
        bench_scalar(timer, f"kernel pdf+union (B={n})",
                     lambda t, w: sample_pdf_union_eval(t, w, 128), t, w)

    cfg = NeRFConfig(
        batch_size=4096, ns_coarse=64, ns_fine=128, num_layers=8,
        hidden_dim=256, skip_layer=4, l_xyz=10, l_dir=4,
        compute_dtype="bfloat16", use_pallas=True,
    ).validate()
    trainer = Trainer(cfg, 2.0, 6.0)

    if "chunk" in phases:
        o = np.tile(np.array([0, 0, 4.0], np.float32), (n, 1))
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o_dev, d_dev = trainer.put_global_batch((o, d))

        def chunk_fn(o, d):
            out = trainer._render(trainer.state, o, d)
            return out["rgb_fine"]

        bench_scalar(timer, f"eval chunk coarse+pdf+fine (B={n})",
                     chunk_fn, o_dev, d_dev)

    if "frame" in phases:
        h = wd = 800
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 4.0
        times = []
        for i in range(args.frames):
            t0 = time.perf_counter()
            out = trainer.render_image(pose, h, wd, focal=1000.0,
                                       chunk=args.chunk)
            np.asarray(out["rgb"])
            times.append(time.perf_counter() - t0)
            print(f"  frame {i}: {times[-1]:.2f}s", flush=True)
        print(f"frame 800x800: best {min(times):.2f}s of {len(times)} "
              f"(all: {['%.2f' % x for x in times]})", flush=True)


if __name__ == "__main__":
    sys.exit(main())
