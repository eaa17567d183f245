"""A/B of the resize-focal fix on a resized config (CPU, ~10 min).

Both reference loaders keep the native-resolution focal when resizing
images to the config resolution (see pipeline.rescale_focal).  This
script renders the procedural sphere scene to a genuine
tiny_nerf_data.npz at 50x50, then trains the 25x25 debug-style config
twice through the REAL Lego loader path: once with the fix (focal
rescaled) and once with the reference behavior (rescale_focal patched to
identity).  Writes docs/evidence/focal_ab.json.

Usage: python scripts/exp_focal_ab.py [--epochs 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_npz(path: str, n_views: int = 16, hw: int = 50) -> None:
    from nerf_keras_tpu.data.synthetic import _render_analytic
    from nerf_keras_tpu.ops.rays import get_rays, pose_spherical

    rng = np.random.default_rng(3)
    focal = 1.2 * hw
    images, poses = [], []
    thetas = np.linspace(0.0, 360.0, n_views, endpoint=False)
    for theta in thetas:
        phi = float(rng.uniform(-40.0, -20.0))
        c2w = pose_spherical(float(theta), phi, 4.0)
        o, d = get_rays(hw, hw, focal, c2w)
        images.append(_render_analytic(np.asarray(o), np.asarray(d)))
        p44 = np.eye(4, dtype=np.float32)
        p44[:3, :4] = np.asarray(c2w)[:3, :4]
        poses.append(p44)
    np.savez(path, images=np.stack(images).astype(np.float32),
             poses=np.stack(poses), focal=np.float64(focal))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--out", type=str, default="docs/evidence")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import nerf_keras_tpu.data.lego as lego_mod
    from nerf_keras_tpu.cli.train import run_training
    from nerf_keras_tpu.data.lego import prepare_lego_data

    work = tempfile.mkdtemp(prefix="focal_ab_")
    npz = os.path.join(work, "tiny_nerf_data.npz")
    build_npz(npz)

    cfg = {
        "BATCH_SIZE": 512, "NS_COARSE": 8, "NS_FINE": 16,
        "HEIGHT": 25, "WIDTH": 25, "L_XYZ": 10, "L_DIR": 4,
        "NUM_LAYERS": 4, "HIDDEN_DIM": 64, "SKIP_LAYER": 4,
        "EPOCHS": args.epochs, "LEARNING_RATE": 0.001,
        "BATCH_NORM": False, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32", "EVAL_EVERY": 3,
    }
    cfg_path = os.path.join(work, "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    def prepare(h, w, data_dir=None):
        return prepare_lego_data(h, w, path=npz)

    results = {}
    orig = lego_mod.rescale_focal
    for tag, fn in (("fixed", orig),
                    ("reference", lambda f, *a: float(f))):
        lego_mod.rescale_focal = fn
        try:
            run_dir = os.path.join(work, f"run_{tag}")
            print(f"[focal_ab] training {tag} ...", flush=True)
            run_training(
                prepare, cfg_path, default_eval_every=3,
                argv=["--config", cfg_path, "--run-dir", run_dir],
            )
            hist = [x for x in os.listdir(run_dir)
                    if x.startswith("history")][0]
            with open(os.path.join(run_dir, hist)) as f:
                h = json.load(f)
            results[tag] = {"val_psnrs": h["val_psnrs"],
                            "train_psnr_tail": h["psnrs"][-2:]}
            print(f"[focal_ab] {tag}: val={h['val_psnrs']}", flush=True)
        finally:
            lego_mod.rescale_focal = orig

    report = {"scene": "sphere orbit npz 50x50 -> trained at 25x25",
              "epochs": args.epochs, **results}
    out = os.path.join(args.out, "focal_ab.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[focal_ab] report at {out}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
