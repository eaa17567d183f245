"""Whole-frame render timing on the live backend.

Times real 800x800 frames through trainer.render_rays (the host chunk
loop with outputs left on device and one final fetch — render_image's
strategy) across chunk sizes.

Historical note: this script originally A/B'd the single-dispatch
lax.map-over-chunks frame against the host loop and measured 3.40 s vs
2.58 s (docs/PERF.md round-2 section); the losing lax.map path was then
removed from the Trainer, so only the host-loop variant remains to time.

Usage: python scripts/exp_frame.py [--hw 800] [--chunk 16384] [--frames 3]
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
    p.add_argument("--hw", type=int, default=800)
    p.add_argument("--chunk", type=int, default=16384)
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--xla", action="store_true")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer

    cfg = NeRFConfig(
        batch_size=4096, ns_coarse=64, ns_fine=128, num_layers=8,
        hidden_dim=256, compute_dtype="bfloat16",
        use_pallas=not args.xla and jax.default_backend() == "tpu",
    ).validate()
    trainer = Trainer(cfg, 2.0, 6.0)
    print(f"[exp] backend={jax.default_backend()} hw={args.hw} "
          f"chunk={args.chunk} pallas={cfg.use_pallas}", flush=True)

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0

    from nerf_keras_tpu.ops.rays import get_rays

    origins, dirs = get_rays(args.hw, args.hw, 1000.0, pose)
    origins = np.asarray(origins).reshape(-1, 3)
    dirs = np.asarray(dirs).reshape(-1, 3)

    def time_fn(name, fn):
        for i in range(args.frames):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out)
            dt = time.perf_counter() - t0
            print(f"{name:34s} frame {i}: {dt:6.2f} s", flush=True)

    # render_image is the host chunk loop since round 2 (the lax.map
    # single-dispatch frame measured 3.40 vs 2.58 s and was removed);
    # sweep the chunk size — bigger chunks amortize per-dispatch cost but
    # raise HBM pressure.
    for chunk in (args.chunk, 2 * args.chunk, 3 * args.chunk):
        time_fn(f"render_rays chunk={chunk}",
                lambda c=chunk: trainer.render_rays(
                    origins, dirs, chunk=c,
                    keys=("rgb_fine", "depth_fine"))["rgb_fine"])


if __name__ == "__main__":
    sys.exit(main())
