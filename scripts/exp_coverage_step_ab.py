"""Same-process step-speed A/B for the round-5 coverage-supervision arms
vs the official proposal step (round-4 VERDICT #1: every throughput claim
must come from interleaved same-process timing — identical programs drift
+-8-10% across sessions on the tunnel).

Arms (all with distortion 1e-4 + anneal inside the compiled step):
  official-64+96   single level, union            (the shipping recipe)
  auxfree-128+32   union-free 128 + 32-sample aux coverage composite
  il4-128          union-free 128, 1-in-4 interleaved union (lax.cond)
  chain-32+96      2-level chain, union, 32-bin uniform grid
  chain-32+64      2-level chain, union, 96-sample fine pass

Usage: python scripts/exp_coverage_step_ab.py --json-out docs/evidence/...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--json-out", type=str, default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import init_train_state, make_train_step
    from nerf_keras_tpu.utils.profiling import StepTimer

    b = args.batch
    common = dict(
        batch_size=b, num_layers=8, hidden_dim=256,
        skip_layer=4, l_xyz=10, l_dir=4, compute_dtype="bfloat16",
        use_pallas=True, train_sampler="proposal",
        distortion_loss_mult=1e-4, prop_anneal_steps=1000,
    )
    variants_cfg = [
        ("official-64+96", NeRFConfig(ns_coarse=64, ns_fine=96,
                                      **common).validate()),
        ("auxfree-128+32", NeRFConfig(ns_coarse=64, ns_fine=128,
                                      prop_union=False, prop_explore=0.1,
                                      prop_aux_samples=32,
                                      **common).validate()),
        ("il4-128       ", NeRFConfig(ns_coarse=64, ns_fine=128,
                                      prop_union=False, prop_explore=0.1,
                                      prop_union_every=4,
                                      **common).validate()),
        ("chain-32+96   ", NeRFConfig(ns_coarse=32, ns_fine=96,
                                      prop_levels=2, prop_samples=64,
                                      **common).validate()),
        ("chain-32+64   ", NeRFConfig(ns_coarse=32, ns_fine=64,
                                      prop_levels=2, prop_samples=64,
                                      **common).validate()),
    ]
    near, far = 2.0, 6.0

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (b, 1))
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = tuple(jax.device_put(x) for x in (images, origins, dirs))

    variants = []
    for tag, cfg in variants_cfg:
        state = jax.device_put(init_train_state(jax.random.PRNGKey(0), cfg))
        step = jax.jit(make_train_step(cfg, near, far))
        variants.append((tag, step, state))

    timer = StepTimer(warmup=args.warmup, steps=args.steps)
    key = jax.random.PRNGKey(7)
    print(f"[exp] backend={jax.default_backend()} batch={b}", flush=True)

    best: dict[str, float] = {}
    for r in range(args.rounds):
        for tag, step, state in variants:
            holder = {"s": state}

            def one():
                holder["s"], metrics = step(holder["s"], batch, key)
                return metrics["loss"]

            stats = timer.measure(one)
            ms = stats["step_ms"]
            best[tag] = min(best.get(tag, float("inf")), ms)
            print(f"round {r} [{tag}] {ms:8.2f} ms "
                  f"({b / ms:6.1f} Krays/s)", flush=True)

    # il4 note: StepTimer's window mixes union and union-free steps in
    # their true 1:3 ratio only if steps % 4 == 0; report as amortized.
    result = {
        "batch": b,
        "backend": jax.default_backend(),
        "rounds": args.rounds,
        "note": "best-of-rounds, interleaved same-process; all arms carry "
                "distortion 1e-4 + anneal in the compiled step; il4 is an "
                "amortized mix of union/union-free steps",
        "arms": {
            tag.strip(): {"ms": round(ms, 2), "krays": round(b / ms, 1)}
            for tag, ms in best.items()
        },
    }
    print(json.dumps(result), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
