"""NDC convergence A/B on a structured forward-facing synthetic capture.

The reference has no NDC; NeRFConfig.ndc adds the original NeRF's
forward-facing treatment.  This script renders the procedural sphere
scene from an LLFF-style forward-facing camera arc into a genuine
on-disk capture (images + poses_bounds.npy), trains the SAME config with
NDC off vs on through the real fern CLI path, and records both val-PSNR
curves to docs/evidence/ndc_ab.json.

Usage (CPU, ~15-25 min): python scripts/exp_ndc_ab.py --epochs 15
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_capture(out_dir: str, n: int, h: int, w: int, focal: float) -> None:
    from PIL import Image

    from nerf_keras_tpu.data.synthetic import _render_analytic
    from nerf_keras_tpu.ops.rays import get_rays

    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(7)
    poses_raw = np.zeros((n, 3, 5))
    for i in range(n):
        dx, dy = rng.uniform(-0.45, 0.45, 2)
        dz = rng.uniform(-0.15, 0.15)
        c2w = np.eye(4, dtype=np.float32)[:3]
        c2w[:, 3] = [dx, dy, 4.0 + dz]
        o, d = get_rays(h, w, focal, c2w)
        rgb = _render_analytic(np.asarray(o), np.asarray(d)).reshape(h, w, 3)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"img_{i:02d}.png")
        )
        # Raw LLFF layout: columns [down, right, back, t, hwf].
        poses_raw[i, :, 0] = [0, -1, 0]
        poses_raw[i, :, 1] = [1, 0, 0]
        poses_raw[i, :, 2] = [0, 0, 1]
        poses_raw[i, :, 3] = c2w[:, 3]
        poses_raw[i, :, 4] = [h, w, focal]
    # Scene depth bounds from the camera arc to the sphere shell.
    bds = np.stack([np.full(n, 2.4), np.full(n, 5.6)], axis=1)
    np.save(os.path.join(out_dir, "poses_bounds.npy"),
            np.concatenate([poses_raw.reshape(n, -1), bds], axis=1))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--views", type=int, default=12)
    p.add_argument("--size", type=int, default=48)
    p.add_argument("--out", type=str, default="docs/evidence")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from nerf_keras_tpu.cli.train import run_training
    from nerf_keras_tpu.data.llff import prepare_fern_data

    h = w = args.size
    work = tempfile.mkdtemp(prefix="ndc_ab_")
    capture = os.path.join(work, "capture")
    os.makedirs(capture)
    build_capture(capture, args.views, h, w, focal=float(args.size) * 1.25)

    base_cfg = {
        "BATCH_SIZE": 1024, "NS_COARSE": 16, "NS_FINE": 32,
        "HEIGHT": h, "WIDTH": w, "L_XYZ": 10, "L_DIR": 4,
        "NUM_LAYERS": 4, "HIDDEN_DIM": 64, "SKIP_LAYER": 4,
        "EPOCHS": args.epochs, "LEARNING_RATE": 0.001,
        "BATCH_NORM": False, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32", "EVAL_EVERY": 3,
    }

    def prepare(height, width, data_dir=None):
        return prepare_fern_data(height, width, basedir=data_dir, factor=1)

    results = {}
    for tag, ndc in (("world", False), ("ndc", True)):
        cfg_path = os.path.join(work, f"cfg_{tag}.json")
        with open(cfg_path, "w") as f:
            json.dump({**base_cfg, "NDC": ndc}, f)
        run_dir = os.path.join(work, f"run_{tag}")
        print(f"[ndc_ab] training {tag} ...", flush=True)
        run_training(
            prepare, cfg_path, default_eval_every=3,
            argv=["--config", cfg_path, "--data-dir", capture,
                  "--run-dir", run_dir],
        )
        hist_name = [x for x in os.listdir(run_dir) if x.startswith("history")][0]
        with open(os.path.join(run_dir, hist_name)) as f:
            hist = json.load(f)
        results[tag] = {
            "val_psnrs": hist["val_psnrs"],
            "train_psnrs": hist["psnrs"][-3:],
        }
        print(f"[ndc_ab] {tag}: val_psnrs={hist['val_psnrs']}", flush=True)

    report = {
        "scene": {"views": args.views, "h": h, "w": w,
                  "kind": "forward-facing sphere arc"},
        "epochs": args.epochs,
        "config": base_cfg,
        **results,
    }
    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "ndc_ab.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[ndc_ab] report at {out_path}", flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
