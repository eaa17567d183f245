"""Same-process A/B: staged device-side chunk slicing vs per-chunk
host->device puts on the whole-frame render (tunnel drift makes
cross-process frame numbers meaningless).

Usage: python scripts/exp_frame_ab.py [--frames 3]
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
    p.add_argument("--frames", type=int, default=3)
    p.add_argument("--chunk", type=int, default=16384)
    p.add_argument("--chunks", type=str, default=None,
                   help="comma list: sweep chunk sizes instead of the "
                        "staged-vs-per-chunk A/B")
    args = p.parse_args()
    import jax  # noqa: F401

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.ops.rays import get_rays

    cfg = NeRFConfig(
        batch_size=4096, ns_coarse=64, ns_fine=128, num_layers=8,
        hidden_dim=256, skip_layer=4, l_xyz=10, l_dir=4,
        compute_dtype="bfloat16", use_pallas=True,
    ).validate()
    trainer = Trainer(cfg, 2.0, 6.0)
    h = w = 800
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    o, d = get_rays(h, w, 1000.0, pose)
    o = np.asarray(o).reshape(-1, 3)
    d = np.asarray(d).reshape(-1, 3)

    def frame(staged, chunk):
        t0 = time.perf_counter()
        out = trainer.render_rays(
            o, d, chunk=chunk, keys=("rgb_fine", "depth_fine"),
            staged=staged,
        )
        np.asarray(out["rgb_fine"])
        return time.perf_counter() - t0

    if args.chunks:
        sizes = [int(x) for x in args.chunks.split(",")]
        for c in sizes:
            print(f"[frame_ab] compile chunk={c}: {frame(False, c):.1f}s",
                  flush=True)
        for i in range(args.frames):
            row = " | ".join(
                f"c{c}: {frame(False, c):.2f}s" for c in sizes
            )
            print(f"round {i}: {row}", flush=True)
        return

    print("[frame_ab] warmup (compile):",
          f"{frame(True, args.chunk):.1f}s", flush=True)
    for i in range(args.frames):
        a = frame(True, args.chunk)
        b = frame(False, args.chunk)
        print(f"round {i}: staged {a:.2f}s | per-chunk {b:.2f}s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
