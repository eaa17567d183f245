#!/usr/bin/env python
"""Benchmark: flagship training throughput (rays/sec/chip).

Runs the lego_batch_h256_tpu workload (batch 4096 rays, 64 coarse + 128
fine samples, two 8x256 MLPs) on procedural data, on whatever accelerator
JAX exposes, and prints ONE JSON line:

    {"metric": "train_rays_per_sec_per_chip", "value": N,
     "unit": "rays/s", "vs_baseline": N / 1e6}

vs_baseline is measured against the driver north star of 1 Mrays/sec/chip
(BASELINE.md; the reference publishes no numbers of its own).

Extra diagnostics (step time, frame render time) go to stderr with
--full; the JSON contract line is always the only stdout output.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("--full", action="store_true",
                   help="also time an 800x800 frame render (stderr)")
    p.add_argument("--use-pallas", action="store_true", default=None)
    args = p.parse_args()

    import jax

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer

    cfg = NeRFConfig(
        batch_size=args.batch_size,
        ns_coarse=64,
        ns_fine=128,
        num_layers=8,
        hidden_dim=256,
        compute_dtype="bfloat16",
        use_pallas=bool(args.use_pallas) if args.use_pallas is not None else False,
    ).validate()

    n_dev = jax.device_count()
    print(
        f"[bench] backend={jax.default_backend()} devices={n_dev} "
        f"batch={cfg.batch_size} samples={cfg.ns_coarse}+{cfg.ns_fine} "
        f"pallas={cfg.use_pallas}",
        file=sys.stderr,
    )

    trainer = Trainer(cfg, 2.0, 6.0)

    rng = np.random.default_rng(0)
    b = cfg.batch_size
    images = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (b, 1))
    batch = trainer.put_batch((images, origins, dirs))

    # Sync via value fetch, not block_until_ready: on tunneled PJRT
    # backends (axon) block_until_ready returns before execution finishes.
    # One fetch per timing window; the measured RTT is subtracted.
    for _ in range(args.warmup):
        metrics = trainer.train_step(batch)
    float(metrics["loss"])

    t_r = time.perf_counter()
    float(metrics["loss"])  # already materialized: measures pure fetch RTT
    rtt = time.perf_counter() - t_r

    t0 = time.perf_counter()
    for _ in range(args.steps):
        metrics = trainer.train_step(batch)
    loss = float(metrics["loss"])
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)
    assert np.isfinite(loss), f"non-finite loss in bench: {loss}"

    step_time = dt / args.steps
    rays_per_sec = b / step_time
    rays_per_sec_per_chip = rays_per_sec / n_dev
    print(
        f"[bench] step_time={step_time * 1e3:.2f} ms "
        f"throughput={rays_per_sec / 1e6:.3f} Mrays/s total, "
        f"{rays_per_sec_per_chip / 1e6:.3f} Mrays/s/chip",
        file=sys.stderr,
    )

    if args.full:
        h = w = 800
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 4.0
        t0 = time.perf_counter()
        out = trainer.render_image(pose, h, w, focal=1000.0, chunk=16384)
        np.asarray(out["rgb"])
        frame_time = time.perf_counter() - t0
        # second frame: compiled path only
        t0 = time.perf_counter()
        out = trainer.render_image(pose, h, w, focal=1000.0, chunk=16384)
        np.asarray(out["rgb"])
        frame_time2 = time.perf_counter() - t0
        print(
            f"[bench] 800x800 frame: {frame_time:.2f}s (first) "
            f"{frame_time2:.2f}s (steady; target <2s)",
            file=sys.stderr,
        )

    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec_per_chip, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec_per_chip / 1e6, 4),
    }))


if __name__ == "__main__":
    main()
