#!/usr/bin/env python
"""Collect the round-3 continuation quality-matrix runs into one evidence
JSON (multi-seed replication of the online-proposal-vs-coarse claim, the
union-layout PROP_TARGET_BLUR x DISTORTION probes, and the union-free +
distortion probes).

Usage: python scripts/collect_quality_matrix.py --out docs/evidence/...json
Reads /tmp/run_q_<tag>/history_*.json written by the /tmp chain scripts.
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def load_history(run_dir: str) -> dict | None:
    hits = sorted(glob.glob(os.path.join(run_dir, "history_*.json")))
    if not hits:
        return None
    with open(hits[-1]) as f:
        return json.load(f)


def summarize(run_dir: str, cfg_path: str) -> dict | None:
    h = load_history(run_dir)
    if h is None:
        return None
    if not os.path.exists(cfg_path):
        # Fall back to the checkpoint's config sidecar (always written by
        # the trainer, survives after the /tmp launcher configs are gone).
        side = sorted(glob.glob(os.path.join(run_dir, "*.ckpt.npz.config.json")))
        cfg_path = side[-1] if side else cfg_path
    cfg = json.load(open(cfg_path)) if os.path.exists(cfg_path) else {}
    val = h.get("val_psnrs", [])
    out = {
        "config": {
            k: cfg[k]
            for k in (
                "SEED", "TRAIN_SAMPLER", "PROP_UNION", "PROP_EXPLORE",
                "PROP_TARGET_BLUR", "PROP_ANNEAL_STEPS",
                "DISTORTION_LOSS_MULT", "PROP_LEVELS", "PROP_SAMPLES",
                "NS_COARSE", "NS_FINE", "PROP_AUX_SAMPLES",
                "PROP_AUX_LOSS_MULT", "PROP_UNION_EVERY", "EPOCHS",
            )
            if k in cfg
        },
        "val_psnr_evals": [round(float(v), 2) for v in val],
        "val_psnr_final": round(float(val[-1]), 2) if val else None,
        "val_psnr_peak": round(float(max(val)), 2) if val else None,
    }
    if h.get("val_ssims"):
        out["val_ssim_final"] = round(float(h["val_ssims"][-1]), 4)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--tags", nargs="*", default=None,
                   help="default: every /tmp/run_q_* present")
    args = p.parse_args()

    if args.tags:
        tags = args.tags
    else:
        tags = sorted(
            os.path.basename(d)[len("run_q_"):]
            for d in glob.glob("/tmp/run_q_*")
        )
    arms = {}
    for tag in tags:
        row = summarize(f"/tmp/run_q_{tag}", f"/tmp/q_{tag}.json")
        if row is not None:
            arms[tag] = row
    report = {
        "what": (
            "80-epoch flagship synthetic quality matrix, post-precision-fix "
            "kernels, real v5e, batch 4096, 64+128 samples, LR decay + EMA "
            "knobs on every arm; coarse arms DISTORTION=0, prop arms as "
            "tagged.  Multi-seed replication + PROP_TARGET_BLUR and "
            "union-free distortion probes."
        ),
        "arms": arms,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out} ({len(arms)} arms)")
    for tag, row in arms.items():
        print(f"  {tag}: final {row['val_psnr_final']} peak {row['val_psnr_peak']}")


if __name__ == "__main__":
    main()
