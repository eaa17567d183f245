#!/usr/bin/env python
"""Same-process A/B: selector-matmul vs RESHAPE layout movements in the
fused kernels (round-5; premise probe docs/evidence/sample_major_probe
.json).  Builds the official proposal train step and the serving render
chunk under BOTH movement modes (the module flag is read at trace time;
each variant is compiled eagerly inside its window — jit is lazy), checks
the two steps' losses/render outputs agree, and times them interleaved.

Usage: python scripts/exp_reshape_moves_ab.py --json-out docs/evidence/reshape_moves_ab.json
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
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--json-out", type=str, default=None)
    args = p.parse_args()

    import jax

    import nerf_keras_tpu.ops.pallas.fused_render as fr
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import (
        init_train_state,
        make_render_fn,
        make_train_step,
    )
    from nerf_keras_tpu.utils.profiling import StepTimer

    b = args.batch
    cfg = NeRFConfig(
        batch_size=b, ns_coarse=64, ns_fine=96, num_layers=8,
        hidden_dim=256, skip_layer=4, l_xyz=10, l_dir=4,
        compute_dtype="bfloat16", use_pallas=True,
        train_sampler="proposal", distortion_loss_mult=1e-4,
        prop_anneal_steps=1000,
    ).validate()
    near, far = 2.0, 6.0

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (b, 1))
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = tuple(jax.device_put(x) for x in (images, origins, dirs))
    state0 = init_train_state(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(7)

    chunk = 16384
    ro = np.tile(np.array([0, 0, 4.0], np.float32), (chunk, 1))
    rd = rng.normal(size=(chunk, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro_d, rd_d = jax.device_put(ro), jax.device_put(rd)

    variants = []
    for name, flag in (("selector", False), ("reshape", True)):
        fr._RESHAPE_MOVES = flag
        step = jax.jit(make_train_step(cfg, near, far))
        render = jax.jit(make_render_fn(cfg, near, far))
        t0 = time.perf_counter()
        st = jax.device_put(state0)
        st1, m = step(st, batch, key)   # eager compile inside the window
        loss = float(m["loss"])
        out = render(st1, ro_d, rd_d)
        rgb = np.asarray(out["rgb_fine"])
        print(f"[{name}] compiled in {time.perf_counter()-t0:.1f}s "
              f"loss={loss:.6f}", flush=True)
        variants.append(dict(name=name, step=step, render=render,
                             loss=loss, rgb=rgb, state=jax.device_put(state0)))

    # numerics: identical inputs; reshape movements are exact while the
    # selector path bf16-rounds sigma/rgb movement, so allow that scale
    dl = abs(variants[0]["loss"] - variants[1]["loss"])
    drgb = float(np.abs(variants[0]["rgb"] - variants[1]["rgb"]).max())
    print(f"[ab] |dloss|={dl:.2e} max|drgb|={drgb:.2e}", flush=True)

    timer = StepTimer(warmup=args.warmup, steps=args.steps)
    best = {}
    for r in range(args.rounds):
        for v in variants:
            holder = {"s": v["state"]}

            def one(step=v["step"]):
                holder["s"], m = step(holder["s"], batch, key)
                return m["loss"]

            ms = timer.measure(one)["step_ms"]
            best[v["name"]] = min(best.get(v["name"], 1e9), ms)
            print(f"round {r} [{v['name']:8s}] step {ms:7.2f} ms "
                  f"({b/ms:6.1f} Krays/s)", flush=True)
        # render chunk timing
        for v in variants:
            def onef(render=v["render"], st=v["state"]):
                return render(st, ro_d, rd_d)["rgb_fine"][0, 0]

            ms = timer.measure(onef)["step_ms"]
            best[v["name"] + "_render"] = min(
                best.get(v["name"] + "_render", 1e9), ms)
            print(f"round {r} [{v['name']:8s}] render16k {ms:7.2f} ms",
                  flush=True)

    result = {
        "batch": b, "backend": jax.default_backend(),
        "loss_delta": dl, "rgb_delta": drgb,
        "best_ms": {k: round(v, 2) for k, v in best.items()},
        "note": "official 64+96 proposal step + 16384-ray serving render "
                "chunk; interleaved best-of-rounds, same process",
    }
    print(json.dumps(result), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
