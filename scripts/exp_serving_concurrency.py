#!/usr/bin/env python
"""Measure the render server under CONCURRENT clients (round-4 VERDICT #7).

serving.py serializes renders through a lock onto the single jitted
chunked renderer; nothing measured what a second client pays.  This
harness starts the REAL server (RenderService + ThreadingHTTPServer) over
a checkpoint, hammers it with N concurrent HTTP clients, and reports
per-concurrency throughput and p50/p99 latency plus the service's device
duty cycle — the number that decides whether request COALESCING (batching
queued rays into one chunk stream) is worth building: if the lock-held
render time already covers ~100% of the wall clock, the device is
saturated and coalescing can only help by removing per-chunk padding
waste on small frames, not by filling idle gaps.

Usage (TPU, ~2-4 min after compile):
    python scripts/exp_serving_concurrency.py \
        --out docs/evidence/serving_concurrency.json
CPU smoke: --platform cpu --size 64 --requests 2 --levels 1,2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def make_checkpoint(cfg, run_dir: str) -> str:
    """One-step-trained checkpoint (render timing needs weights, not
    quality — same rationale as bench.py's frame measurement)."""
    import numpy as np

    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.utils.checkpoint import checkpoint_name, save_checkpoint

    trainer = Trainer(cfg, 2.0, 6.0)
    rng = np.random.default_rng(0)
    b = cfg.batch_size
    imgs = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (b, 1))
    trainer.train_step(trainer.put_batch((imgs, origins, dirs)))
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, checkpoint_name(cfg))
    save_checkpoint(path, trainer.state, cfg,
                    scene={"near": 2.0, "far": 6.0, "focal": 1000.0,
                           "ndc": False})
    return path


def hammer(port: int, size: int, concurrency: int, requests_each: int):
    """N client threads, each issuing sequential renders; returns
    (latencies, wall)."""
    url = (f"http://127.0.0.1:{port}/render?theta={{}}&phi=-30&radius=4"
           f"&width={size}&height={size}")
    lat: list[float] = []
    lock = threading.Lock()

    def client(cid: int):
        for i in range(requests_each):
            t0 = time.perf_counter()
            with urllib.request.urlopen(
                    url.format(10 * cid + i), timeout=600) as r:
                r.read()
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return lat, time.perf_counter() - t0


def pctl(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(q * (len(xs) - 1))))]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(
        REPO, "docs", "evidence", "serving_concurrency.json"))
    p.add_argument("--size", type=int, default=200,
                   help="square frame size per request")
    p.add_argument("--requests", type=int, default=8,
                   help="requests per client per level")
    p.add_argument("--levels", default="1,2,4,8",
                   help="comma-separated concurrency levels")
    p.add_argument("--platform", default=None)
    p.add_argument("--port", type=int, default=8077)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from nerf_keras_tpu.config import load_config
    from nerf_keras_tpu.serving import RenderService, _make_handler
    from http.server import ThreadingHTTPServer

    cfg = load_config(os.path.join(REPO, "config", "lego_batch_h256.json"))
    import dataclasses

    # serving defaults: proposal-trained flagship model (the fast path)
    cfg = dataclasses.replace(
        cfg, train_sampler="proposal", ns_coarse=64, ns_fine=96,
        batch_size=4096, height=100, width=100,
    ).validate()
    ckpt = make_checkpoint(cfg, "/tmp/serving_conc_ckpt")
    service = RenderService(cfg, ckpt)
    httpd = ThreadingHTTPServer(("127.0.0.1", args.port),
                                _make_handler(service))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    # warmup: compile the (H, chunk) program outside every timed window
    t0 = time.perf_counter()
    with urllib.request.urlopen(
            f"http://127.0.0.1:{args.port}/render?width={args.size}"
            f"&height={args.size}", timeout=3600) as r:
        r.read()
    warm_s = time.perf_counter() - t0

    rows = []
    for conc in [int(x) for x in args.levels.split(",")]:
        busy0 = service.total_render_s
        lat, wall = hammer(args.port, args.size, conc, args.requests)
        busy = service.total_render_s - busy0
        rows.append({
            "concurrency": conc,
            "requests": len(lat),
            "p50_s": round(pctl(lat, 0.50), 3),
            "p99_s": round(pctl(lat, 0.99), 3),
            "mean_s": round(sum(lat) / len(lat), 3),
            "throughput_fps": round(len(lat) / wall, 3),
            # fraction of wall time the lock-held device render covered:
            # ~1.0 = saturated (coalescing cannot fill idle gaps)
            "device_duty": round(busy / wall, 3),
        })
        print(f"[conc] c={conc}: p50 {rows[-1]['p50_s']}s "
              f"p99 {rows[-1]['p99_s']}s "
              f"{rows[-1]['throughput_fps']} fps "
              f"duty {rows[-1]['device_duty']}", flush=True)

    httpd.shutdown()
    report = {
        "what": (f"render server under concurrent clients: {args.size}x"
                 f"{args.size} frames, proposal-sampler serving config, "
                 f"backend={jax.default_backend()}; duty ~1.0 means the "
                 "serialized device render already covers the wall clock "
                 "— request coalescing could not add throughput, only "
                 "cut per-request queueing by merging frames"),
        "backend": jax.default_backend(),
        "frame": [args.size, args.size],
        "warmup_first_request_s": round(warm_s, 2),
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[conc] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
