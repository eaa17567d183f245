#!/usr/bin/env python
"""FREQ_ANNEAL quality arms: few-view rescue + flagship non-regression.

Target claim (docs/PERF.md "Multi-object scene generalization"): the
spheres-scene seed-23 12-view run collapses IDENTICALLY under both
samplers — val stuck ~11 dB from the first eval while train climbs — a
fine-MLP init basin on an under-constrained capture.  The recorded
remedy was "add views".  Coarse-to-fine frequency annealing
(FREQ_ANNEAL_*, ops/freq_anneal.py — FreeNeRF's few-shot treatment) is
the in-training fix candidate; this script runs the annealed arms against
the recorded collapse/control numbers in
docs/evidence/spheres_scene_quality.json and sample_budget_quality.json
(control arms are NOT re-run — same recipe, same seeds, same capture).

Arms (80-epoch flagship, 100x100, batch 4096, bf16 Pallas, real v5e,
LR decay + EMA like every matrix arm):
  sph23_prop_fa40    spheres s23 12v, official recipe + FREQ_ANNEAL_EPOCHS=40
  sph23_coarse_fa40  spheres s23 12v, coarse 64+128   + FREQ_ANNEAL_EPOCHS=40
  main42_prop_fa20   single-sphere s42, official recipe + FREQ_ANNEAL_EPOCHS=20
  main7_prop_fa20    single-sphere s7,  official recipe + FREQ_ANNEAL_EPOCHS=20
(rescue arms anneal over half the run — the failure is an EARLY basin;
non-regression arms use a quarter so the top octaves keep 3/4 of the
schedule — FreeNeRF's many-view guidance is shorter-or-off.)

One process: arms sharing a step program shape reuse the in-process
compile cache.  ~10 min Pallas compile per distinct program.

Usage: python scripts/exp_freq_anneal.py [--arms a,b,...] [--epochs 80]
Collect: python scripts/collect_quality_matrix.py style output is written
directly to docs/evidence/freq_anneal_quality.json at the end.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = {
    "BATCH_SIZE": 4096, "NS_COARSE": 64, "NS_FINE": 128,
    "HEIGHT": 100, "WIDTH": 100, "L_XYZ": 10, "L_DIR": 4,
    "NUM_LAYERS": 8, "HIDDEN_DIM": 256, "SKIP_LAYER": 4,
    "EPOCHS": 80, "LEARNING_RATE": 5e-4, "BATCH_NORM": False,
    "WITH_GCS": False, "EVAL_EVERY": 10,
    "LR_FINAL": 5e-5, "EMA_DECAY": 0.995,
}
OFFICIAL = {
    "TRAIN_SAMPLER": "proposal", "NS_COARSE": 64, "NS_FINE": 96,
    "DISTORTION_LOSS_MULT": 1e-4, "PROP_ANNEAL_STEPS": -1,
}

ARMS = {
    "sph23_prop_fa40": dict(
        OFFICIAL, SEED=23, FREQ_ANNEAL_EPOCHS=40, _scene="spheres"),
    "sph23_coarse_fa40": dict(
        SEED=23, FREQ_ANNEAL_EPOCHS=40, _scene="spheres"),
    "main42_prop_fa20": dict(OFFICIAL, SEED=42, FREQ_ANNEAL_EPOCHS=20),
    "main7_prop_fa20": dict(OFFICIAL, SEED=7, FREQ_ANNEAL_EPOCHS=20),
}


def run_arm(tag: str, spec: dict, epochs: int) -> dict | None:
    import train_synthetic
    from nerf_keras_tpu.cli.train import run_training

    spec = dict(spec)
    scene = spec.pop("_scene", "sphere")
    cfg = dict(BASE)
    cfg.update(spec)
    cfg["EPOCHS"] = epochs
    cfg_path = f"/tmp/fa_{tag}.json"
    run_dir = f"/tmp/run_fa_{tag}"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    argv = ["--config", cfg_path, "--run-dir", run_dir]
    if scene != "sphere":
        argv += ["--scene", scene]
    print(f"[exp] === {tag} (scene={scene}) ===", flush=True)
    run_training(train_synthetic.prepare, cfg_path, default_eval_every=10,
                 argv=argv)
    hits = sorted(glob.glob(os.path.join(run_dir, "history_*.json")))
    if not hits:
        return None
    h = json.load(open(hits[-1]))
    val = h.get("val_psnrs", [])
    row = {
        "config": {k: v for k, v in spec.items() if not k.startswith("_")},
        "scene": scene,
        "val_psnr_evals": [round(float(v), 2) for v in val],
        "val_psnr_final": round(float(val[-1]), 2) if val else None,
        "val_psnr_peak": round(float(max(val)), 2) if val else None,
    }
    if h.get("val_ssims"):
        row["val_ssim_final"] = round(float(h["val_ssims"][-1]), 4)
    return row


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--arms", default=",".join(ARMS))
    p.add_argument("--epochs", type=int, default=80)
    p.add_argument("--out", default="docs/evidence/freq_anneal_quality.json")
    args = p.parse_args()

    results = {}
    for tag in args.arms.split(","):
        tag = tag.strip()
        if not tag:
            continue
        row = run_arm(tag, ARMS[tag], args.epochs)
        if row is not None:
            results[tag] = row
            print(f"[exp] {tag}: final={row['val_psnr_final']} "
                  f"peak={row['val_psnr_peak']} evals={row['val_psnr_evals']}",
                  flush=True)

    report = {
        "what": (
            "FREQ_ANNEAL (coarse-to-fine encode-octave anneal, "
            "ops/freq_anneal.py) quality arms: the spheres seed-23 12-view "
            "rescue attempt + flagship official-recipe non-regression.  "
            "80-epoch flagship arms (100x100, batch 4096, 8x256 fine net, "
            "bf16 Pallas, real v5e, LR decay 5e-5 + EMA 0.995).  CONTROLS "
            "(not re-run): spheres_scene_quality.json s23 collapse "
            "(coarse 11.55 / prop 11.45, val stuck from first eval); "
            "sample_budget_quality.json official 64+96 "
            "(25.08/25.67 at seeds 42/7)."
        ),
        "arms": results,
    }
    existing = {}
    if os.path.exists(args.out):
        existing = json.load(open(args.out)).get("arms", {})
    existing.update(results)
    report["arms"] = existing
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[exp] wrote {args.out} ({len(existing)} arms)")


if __name__ == "__main__":
    main()
