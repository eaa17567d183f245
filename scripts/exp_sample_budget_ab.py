"""Same-process A/B: the official proposal (union) train step across
SAMPLE BUDGETS — the official-step decomposition (docs/PERF.md) showed
the step is 94% fine megakernel, so the only remaining lever is how many
samples the fine pass composites.  The union layout's count is
``ns_coarse + ns_fine`` (proposal draw + placed); this measures the step
at smaller proposal draws / placed counts on the real v5e.

Quality gates adoption (see docs/evidence/sample_budget_quality.json —
80-epoch flagship arms at each budget); this script provides the speed
half of the claim.  Tunnel throughput drifts +-8% across sessions, so
all variants interleave inside one process and report best-of-rounds.

Usage: python scripts/exp_sample_budget_ab.py [--rounds 3]
         [--variants 64+128,32+128,32+96]
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
    p.add_argument("--variants", type=str, default="64+128,32+128",
                   help="comma list of <ns_coarse>+<ns_fine> union budgets")
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
    near, far = 2.0, 6.0

    budgets = []
    for spec in args.variants.split(","):
        nc, nf = (int(x) for x in spec.strip().split("+"))
        budgets.append((nc, nf))

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (b, 1))
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = tuple(jax.device_put(x) for x in (images, origins, dirs))

    variants = []
    for nc, nf in budgets:
        cfg = NeRFConfig(
            batch_size=b, ns_coarse=nc, ns_fine=nf, num_layers=8,
            hidden_dim=256, skip_layer=4, l_xyz=10, l_dir=4,
            compute_dtype="bfloat16", use_pallas=True,
            train_sampler="proposal", distortion_loss_mult=1e-4,
        ).validate()
        tag = f"{nc}+{nf}"
        state = jax.device_put(init_train_state(jax.random.PRNGKey(0), cfg))
        step = jax.jit(make_train_step(cfg, near, far))
        variants.append((tag, step, state))
        print(f"[exp] built {tag} (union total {nc + nf})", flush=True)

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

    base_tag = f"{budgets[0][0]}+{budgets[0][1]}"
    result = {
        "batch": b,
        "backend": jax.default_backend(),
        "rounds": args.rounds,
        "note": "best-of-rounds, interleaved same-process; first variant "
                "is the baseline",
        "variants": {
            tag: {
                "step_ms": round(ms, 2),
                "krays": round(b / ms, 1),
                "speedup_vs_first": round(best[base_tag] / ms, 3),
            }
            for tag, ms in best.items()
        },
    }
    print(json.dumps(result), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
