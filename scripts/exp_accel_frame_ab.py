#!/usr/bin/env python
"""Same-process INTERLEAVED A/B: float vs int8(+in-state proposal)
serving frame at the official 64+96 budget (round 5).

bench.py's first two r5 sessions measured the accel frame on OPPOSITE
sides of the float frame (1.58x faster, then 0.85x) because the two
steady loops ran in different tunnel-drift windows; bench now
interleaves, and this probe is the dedicated higher-rep version that
settles the true ratio at this serving config.

Usage: python scripts/exp_accel_frame_ab.py [--pairs 6]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", type=int, default=6)
    p.add_argument("--size", type=int, default=800)
    p.add_argument("--json-out", type=str, default=None)
    args = p.parse_args()
    import jax

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer

    cfg = NeRFConfig(
        batch_size=4096, ns_coarse=64, ns_fine=96, num_layers=8,
        hidden_dim=256, skip_layer=4, l_xyz=10, l_dir=4,
        compute_dtype="bfloat16", use_pallas=True,
        train_sampler="proposal",
    ).validate()
    trainer = Trainer(cfg, 2.0, 6.0)
    rng = np.random.default_rng(0)
    b = cfg.batch_size
    imgs = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (b, 1))
    trainer.train_step(trainer.put_batch((imgs, origins, dirs)))

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    h = w = args.size
    kw = dict(focal=1000.0, chunk=16384, uint8_rgb=True, need_depth=False)
    o_cal, d_cal = trainer.pose_rays(pose, 64, 64, 1000.0)
    trainer.quantize_for_inference(o_cal, d_cal)

    # warm both programs outside the timed window
    np.asarray(trainer.render_image(pose, h, w, **kw)["rgb"])
    np.asarray(trainer.render_image(pose, h, w, quant=True, **kw)["rgb"])

    fl, q = [], []
    for i in range(args.pairs):
        t0 = time.perf_counter()
        np.asarray(trainer.render_image(pose, h, w, **kw)["rgb"])
        fl.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(trainer.render_image(pose, h, w, quant=True, **kw)["rgb"])
        q.append(time.perf_counter() - t0)
        print(f"pair {i}: float {fl[-1]:.2f}s int8 {q[-1]:.2f}s",
              flush=True)

    result = {
        "backend": jax.default_backend(),
        "frame": [h, w], "pairs": args.pairs,
        "float_s": [round(x, 3) for x in fl],
        "int8_s": [round(x, 3) for x in q],
        "float_best": round(min(fl), 3), "int8_best": round(min(q), 3),
        "ratio_best": round(min(q) / min(fl), 3),
        "ratio_median": round(sorted(q)[len(q) // 2]
                              / sorted(fl)[len(fl) // 2], 3),
        "note": "official 64+96 proposal serving config, device uint8, "
                "no depth; alternating frames, same process",
    }
    print(json.dumps(result), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
