"""Same-process A/B: coarse+fine (reference-parity) vs ONLINE proposal
training (TRAIN_SAMPLER='proposal') at flagship scale.

The proposal mode drops the 8x256 coarse megakernel (fwd+bwd) from the
step and replaces it with a tiny density net + one-sided interlevel
distillation loss (ops/proposal.py) — ~25% of the step's MLP FLOPs on
paper.  This measures what that buys on the real v5e.  Tunnel throughput
drifts +-8% across sessions (docs/PERF.md round-3), so the two jitted
steps are interleaved inside one process.

Usage: python scripts/exp_online_train_ab.py [--batch 4096] [--rounds 3]
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
    flagship = dict(
        batch_size=b, ns_coarse=64, ns_fine=128, num_layers=8,
        hidden_dim=256, skip_layer=4, l_xyz=10, l_dir=4,
        compute_dtype="bfloat16", use_pallas=True,
    )
    cfg_c = NeRFConfig(**flagship).validate()
    cfg_p = NeRFConfig(train_sampler="proposal", **flagship).validate()
    cfg_u = NeRFConfig(
        train_sampler="proposal", prop_union=False, **flagship
    ).validate()
    near, far = 2.0, 6.0

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (b, 1))
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = tuple(jax.device_put(x) for x in (images, origins, dirs))

    variants = []
    for tag, cfg in (("coarse  ", cfg_c), ("proposal", cfg_p),
                     ("no-union", cfg_u)):
        state = jax.device_put(init_train_state(jax.random.PRNGKey(0), cfg))
        step = jax.jit(make_train_step(cfg, near, far))
        variants.append((tag, step, state))

    timer = StepTimer(warmup=args.warmup, steps=args.steps)
    key = jax.random.PRNGKey(7)
    print(f"[exp] backend={jax.default_backend()} batch={b} "
          f"prop={cfg_p.prop_depth}x{cfg_p.prop_hidden} "
          f"l={cfg_p.prop_l_xyz}", flush=True)

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

    ms_c, ms_p = best["coarse  "], best["proposal"]
    ms_u = best["no-union"]
    result = {
        "batch": b,
        "coarse_ms": round(ms_c, 2),
        "proposal_ms": round(ms_p, 2),
        "proposal_nounion_ms": round(ms_u, 2),
        "coarse_krays": round(b / ms_c, 1),
        "proposal_krays": round(b / ms_p, 1),
        "proposal_nounion_krays": round(b / ms_u, 1),
        "speedup": round(ms_c / ms_p, 3),
        "speedup_nounion": round(ms_c / ms_u, 3),
        "backend": jax.default_backend(),
        "rounds": args.rounds,
        "note": "best-of-rounds, interleaved same-process",
    }
    print(json.dumps(result), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
