"""Sampler-recipe quality A/B on a forward-facing NDC capture (TPU).

Round-4 generalization check: does the hierarchical-chain recipe hold on
a DIFFERENT ray parameterization (NDC, t in [0, 1]) and camera geometry
(LLFF-style forward-facing arc) — not just the orbital world-space
scene its matrix ran on?  Renders the analytic sphere scene from a
forward-facing arc into an on-disk LLFF capture (reusing
exp_ndc_ab.build_capture), then trains three arms through the real fern
CLI path at flagship scale with NDC on:

* coarse      — parity sampler + its quality knob (distortion 1e-3);
* official    — single-level proposal union 64+96 (dist 1e-4, anneal);
* chain       — PROP_LEVELS=2 union 64+64 (dist 1e-4, anneal).

Usage (TPU, ~25 min warm): python scripts/exp_chain_ndc_quality.py
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_ndc_ab import build_capture  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=80)
    p.add_argument("--views", type=int, default=12)
    p.add_argument("--size", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", type=str, default="docs/evidence")
    args = p.parse_args()

    from nerf_keras_tpu.cli.train import run_training
    from nerf_keras_tpu.data.llff import prepare_fern_data

    h = w = args.size
    work = tempfile.mkdtemp(prefix="chain_ndc_")
    capture = os.path.join(work, "capture")
    os.makedirs(capture)
    build_capture(capture, args.views, h, w, focal=float(args.size) * 1.25)

    base_cfg = {
        "BATCH_SIZE": 4096, "NS_COARSE": 64, "NS_FINE": 128,
        "HEIGHT": h, "WIDTH": w, "L_XYZ": 10, "L_DIR": 4,
        "NUM_LAYERS": 8, "HIDDEN_DIM": 256, "SKIP_LAYER": 4,
        "EPOCHS": args.epochs, "LEARNING_RATE": 5e-4,
        "BATCH_NORM": False, "WITH_GCS": False, "NDC": True,
        "LR_FINAL": 5e-5, "EMA_DECAY": 0.995, "EVAL_EVERY": 10,
        "SEED": args.seed,
    }
    arms = {
        "coarse": {"DISTORTION_LOSS_MULT": 1e-3},
        "official": {"TRAIN_SAMPLER": "proposal", "NS_FINE": 96,
                     "DISTORTION_LOSS_MULT": 1e-4,
                     "PROP_ANNEAL_STEPS": -1},
        "chain": {"TRAIN_SAMPLER": "proposal", "NS_FINE": 64,
                  "PROP_LEVELS": 2, "DISTORTION_LOSS_MULT": 1e-4,
                  "PROP_ANNEAL_STEPS": -1},
    }

    def prepare(height, width, data_dir=None):
        return prepare_fern_data(height, width, basedir=data_dir, factor=1)

    results = {}
    for tag, over in arms.items():
        cfg_path = os.path.join(work, f"cfg_{tag}.json")
        with open(cfg_path, "w") as f:
            json.dump({**base_cfg, **over}, f)
        run_dir = os.path.join(work, f"run_{tag}")
        print(f"[chain_ndc] training {tag} ...", flush=True)
        run_training(
            prepare, cfg_path, default_eval_every=10,
            argv=["--config", cfg_path, "--data-dir", capture,
                  "--run-dir", run_dir],
        )
        hist = [x for x in os.listdir(run_dir) if x.startswith("history")][0]
        with open(os.path.join(run_dir, hist)) as f:
            hd = json.load(f)
        results[tag] = {
            "config": over,
            "val_psnrs": [round(float(x), 2) for x in hd["val_psnrs"]],
            "val_psnr_final": round(float(hd["val_psnrs"][-1]), 2),
        }
        print(f"[chain_ndc] {tag}: {results[tag]['val_psnrs']}", flush=True)

    report = {
        "what": (
            "Round-4 sampler-recipe A/B on a forward-facing NDC capture "
            "(analytic sphere scene, LLFF-style arc, flagship arch, real "
            "v5e, NDC=true so t is sampled in [0,1]): does the "
            "hierarchical-chain recipe generalize across ray "
            "parameterizations?"
        ),
        "scene": {"views": args.views, "h": h, "w": w,
                  "kind": "forward-facing sphere arc, NDC"},
        "epochs": args.epochs,
        "arms": results,
    }
    suffix = "" if args.seed == 42 else f"_s{args.seed}"
    out_path = os.path.join(args.out, f"chain_ndc_quality{suffix}.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[chain_ndc] report at {out_path}", flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
