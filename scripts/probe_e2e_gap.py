"""Decompose the step-rate vs e2e-sustained throughput gap.

The official step (StepTimer, same batch, fetch-synced) runs ~143.8
Krays/s while 80-epoch training sustains ~122-127 K end-to-end.  At 21
steps/epoch that is ~5 ms/step of non-step time.  Candidates: host batch
assembly (iterate_batches / the C++ batcher), `put_batch` uploads through
the axon tunnel, per-dispatch tunnel RTT, and the epoch-mean metric
accumulation.  This probe times, same-process:

  A. StepTimer step rate (the official methodology) — baseline;
  B. N-step python loop, SAME device batch, one final fetch — adds
     dispatch overhead only;
  C. as B but `put_batch` of a fresh host batch every step — adds upload;
  D. as C but batches come from `iterate_batches` (full input pipeline);
  E. as D but through `Trainer.train_epoch` (adds metric accumulation).

Usage: python scripts/probe_e2e_gap.py [--batch 4096] [--steps 40]
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
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.data.pipeline import RayDataset, iterate_batches
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.utils.profiling import StepTimer

    b, n = args.batch, args.steps
    cfg = NeRFConfig(
        batch_size=b, ns_coarse=64, ns_fine=96, num_layers=8,
        hidden_dim=256, compute_dtype="bfloat16", use_pallas=True,
        train_sampler="proposal", distortion_loss_mult=1e-4,
        prop_anneal_steps=1000,
    ).validate()
    trainer = Trainer(cfg, 2.0, 6.0)

    rng = np.random.default_rng(0)
    n_rays = b * (n + 2)
    pixels = rng.uniform(0, 1, (n_rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (n_rays, 1))
    ds = RayDataset(pixels=pixels, origins=origins, directions=dirs,
                    near=2.0, far=6.0, focal=120.0, height=1, width=1)

    host_batch = (pixels[:b], origins[:b], dirs[:b])
    dev_batch = trainer.put_batch(host_batch)

    # A: official methodology
    metrics = {}

    def one_step():
        metrics.update(trainer.train_step(dev_batch))
        return metrics

    stats = StepTimer(warmup=5, steps=20).measure(one_step)
    print(f"A step (StepTimer): {stats['step_ms']:.2f} ms", flush=True)

    def sync():
        # fetch a scalar — block_until_ready returns early on the tunnel
        return float(metrics["loss"])

    def timed(tag, fn):
        # Warm at the SAME step count as the timed window: epoch-level
        # legs compile shape-dependent epoch-end reductions (e.g. the
        # stack(n)+mean metric accumulation), and the axon remote compile
        # helper charges seconds — in real training those compile once
        # per epoch length and are reused, so the timed window must see
        # them warm too.
        fn(n)
        sync()
        t0 = time.perf_counter()
        fn(n)
        sync()
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{tag}: {dt:.2f} ms/step ({b / dt:.1f} Krays/s)", flush=True)
        return dt

    def loop_same(k):
        for _ in range(k):
            metrics.update(trainer.train_step(dev_batch))

    def loop_put(k):
        for _ in range(k):
            metrics.update(trainer.train_step(trainer.put_batch(host_batch)))

    def loop_pipe(k):
        it = iterate_batches(ds, b, shuffle=True, seed=0, epoch=0)
        for _ in range(k):
            batch = next(it)
            metrics.update(trainer.train_step(trainer.put_batch(batch)))

    def loop_epoch(k):
        import itertools

        it = itertools.islice(
            iterate_batches(ds, b, shuffle=True, seed=0, epoch=0), k
        )
        metrics.update(trainer.train_epoch(it))

    timed("B loop same-batch   ", loop_same)
    timed("C loop + put_batch  ", loop_put)
    timed("D loop + pipeline   ", loop_pipe)
    timed("E train_epoch       ", loop_epoch)


if __name__ == "__main__":
    sys.exit(main())
