"""Same-process A/B: fused Pallas train step with vs without the
distortion regularizer (DISTORTION_LOSS_MULT), plus the XLA+distortion
step it replaces.

The distortion path adds (a) the XLA-side O(S)-cumsum loss and its VJP
and (b) one (B, S) f32 weights-cotangent operand to the fine backward
kernel (render_rays_fused weights_grad).  This measures what that costs
on the real v5e.  Tunnel throughput drifts +-8% across sessions
(docs/PERF.md round-3), so all jitted steps are interleaved inside one
process.

Usage: python scripts/exp_distortion_step_ab.py [--batch 4096] [--rounds 3]
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
    p.add_argument("--skip-xla", action="store_true",
                   help="skip the XLA+distortion arm (saves a compile)")
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
        compute_dtype="bfloat16",
    )
    cfg_base = NeRFConfig(use_pallas=True, **flagship).validate()
    cfg_dist = NeRFConfig(
        use_pallas=True, distortion_loss_mult=1e-3, **flagship
    ).validate()
    cfg_xla = NeRFConfig(
        use_pallas=False, distortion_loss_mult=1e-3, **flagship
    ).validate()
    near, far = 2.0, 6.0

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (b, 1))
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = tuple(jax.device_put(x) for x in (images, origins, dirs))

    arms = [("pallas      ", cfg_base), ("pallas+dist ", cfg_dist)]
    if not args.skip_xla:
        arms.append(("xla+dist    ", cfg_xla))
    variants = []
    for tag, cfg in arms:
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

    result = {
        "batch": b,
        **{
            tag.strip().replace("+", "_") + "_ms": round(ms, 2)
            for tag, ms in best.items()
        },
        "dist_overhead": round(
            best["pallas+dist "] / best["pallas      "], 3
        ),
        "backend": jax.default_backend(),
        "rounds": args.rounds,
        "note": "best-of-rounds, interleaved same-process",
    }
    if not args.skip_xla:
        result["pallas_vs_xla_dist"] = round(
            best["xla+dist    "] / best["pallas+dist "], 3
        )
    print(json.dumps(result), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
