#!/usr/bin/env python
"""Behavioral PSNR parity harness: this framework vs the ACTUAL TF reference.

The real Lego/Fern datasets are unreachable (zero egress), so true-dataset
parity is unverifiable here — but the reference CODE is present and keras/
tensorflow are importable, so we can do the next-strongest thing:

1. render the procedural sphere scene into a genuine ``tiny_nerf_data.npz``
   (images + spherical poses + focal);
2. train the reference itself (its ``prepare_lego_data`` -> tf.data
   pipeline -> ``NeRFTrainer.fit``, /root/reference/train_lego.py flow)
   on it, on CPU, under a shipped config (EPOCHS overridden);
3. train this framework on the SAME npz with reference-faithful settings
   (``SAMPLING_MODE=shared``, ``STOP_PDF_GRADIENT=false``);
4. import the reference's trained ``.weights.h5`` through
   ``utils/keras_import.py`` and evaluate it with OUR eval step on the
   same val rays — weight-level parity on genuinely trained weights;
5. write ``docs/evidence/parity_report.json`` with both PSNR curves and
   the cross-evaluation.

Usage (CPU, ~10-20 min):
    python scripts/parity_vs_reference.py --epochs 12 \
        --config config/lego_batch_debug.json --out docs/evidence
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("KERAS_BACKEND", "tensorflow")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def make_scene_npz(path: str, n_views: int, h: int, w: int) -> None:
    """Render the analytic sphere scene into the tiny_nerf_data.npz layout
    (images (N,H,W,3) f32, poses (N,4,4) f32, focal scalar)."""
    from nerf_keras_tpu.data.synthetic import _render_analytic
    from nerf_keras_tpu.ops.rays import get_rays, pose_spherical

    rng = np.random.default_rng(0)
    focal = 1.2 * max(h, w)
    thetas = np.linspace(0.0, 360.0, n_views, endpoint=False)
    phis = rng.uniform(-40.0, -20.0, size=n_views)
    images, poses = [], []
    for theta, phi in zip(thetas, phis):
        pose = pose_spherical(float(theta), float(phi), 4.0)
        oris, dirs = get_rays(h, w, focal, pose)
        images.append(_render_analytic(np.asarray(oris), np.asarray(dirs)))
        poses.append(np.asarray(pose, np.float32))
    np.savez(
        path,
        images=np.stack(images).astype(np.float32),
        poses=np.stack(poses).astype(np.float32),
        focal=np.float64(focal),
    )


def train_reference(npz_path: str, cfg: dict, epochs: int, out_dir: str) -> dict:
    """Run the reference's own training flow (train_lego.py:22-284 minus
    the per-epoch render callback) on CPU; returns history + weights path."""
    import keras
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    keras.utils.set_random_seed(42)  # train_lego.py:22

    # the reference loader downloads via keras.utils.get_file(origin=URL);
    # pre-seed the keras cache so it resolves offline
    cache = os.path.expanduser("~/.keras/datasets/tiny_nerf_data.npz")
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    import shutil

    shutil.copyfile(npz_path, cache)

    sys.path.insert(0, REFERENCE)
    try:
        import data_utils as ref_du
        import lego_data_utils as ref_lego
        import models as ref_models

        H, W = cfg["HEIGHT"], cfg["WIDTH"]
        train_t, val_t, (near, far), _focal = ref_lego.prepare_lego_data(H, W)
        auto = tf.data.AUTOTUNE
        train_ds = ref_du.create_batched_dataset_pipeline(
            *train_t, cfg["NS_COARSE"], cfg["BATCH_SIZE"], auto,
            near=near, far=far, shuffle=True, rand_sampling=True,
        )
        val_ds = ref_du.create_batched_dataset_pipeline(
            *val_t, cfg["NS_COARSE"], cfg["BATCH_SIZE"], auto,
            near=near, far=far, shuffle=False, rand_sampling=True,
        )
        mk = lambda: ref_models.create_nerf_complete_model(
            num_layers=cfg["NUM_LAYERS"], hidden_dim=cfg["HIDDEN_DIM"],
            skip_layer=cfg["SKIP_LAYER"], lxyz=cfg["L_XYZ"],
            ldir=cfg["L_DIR"], bn=cfg["BATCH_NORM"],
        )
        trainer = ref_models.NeRFTrainer(
            coarse_model=mk(), fine_model=mk(),
            batch_size=cfg["BATCH_SIZE"], ns_coarse=cfg["NS_COARSE"],
            ns_fine=cfg["NS_FINE"], l_xyz=cfg["L_XYZ"], l_dir=cfg["L_DIR"],
        )
        trainer.compile(
            optimizer=keras.optimizers.Adam(cfg["LEARNING_RATE"]),
            loss_fn=keras.losses.MeanSquaredError(),
        )
        imgs, rays = next(iter(train_ds))
        trainer.build(
            input_shape=(imgs.shape[1:], tuple(r.shape[1:] for r in rays))
        )
        hist = trainer.fit(train_ds, validation_data=val_ds, epochs=epochs,
                           verbose=2)
        weights_path = os.path.join(out_dir, "reference_trained.weights.h5")
        trainer.save_weights(weights_path)
        return {
            "history": {k: [float(x) for x in v]
                        for k, v in hist.history.items()},
            "weights": weights_path,
        }
    finally:
        sys.path.remove(REFERENCE)


def train_ours(npz_path: str, cfg: dict, epochs: int) -> dict:
    """Train this framework on the same npz, reference-faithful settings."""
    import jax

    from nerf_keras_tpu.config import config_from_dict
    from nerf_keras_tpu.data.lego import prepare_lego_data
    from nerf_keras_tpu.data.pipeline import iterate_batches
    from nerf_keras_tpu.engine.trainer import Trainer

    ncfg = config_from_dict({
        **cfg, "EPOCHS": epochs,
        "COMPUTE_DTYPE": "float32",        # CPU run; parity over speed
        "SAMPLING_MODE": "shared",          # reference's shared jitter
        "STOP_PDF_GRADIENT": False,         # reference never detaches
        "USE_PALLAS": False,
    })
    train_ds, val_ds, (near, far), _ = prepare_lego_data(
        ncfg.height, ncfg.width, path=npz_path
    )
    trainer = Trainer(ncfg, near, far)
    history: dict[str, list] = {"loss": [], "psnr": [], "val_loss": [],
                                "val_psnr": []}
    for epoch in range(epochs):
        m = trainer.train_epoch(
            iterate_batches(train_ds, ncfg.batch_size, shuffle=True,
                            seed=ncfg.seed, epoch=epoch)
        )
        v = trainer.evaluate(
            iterate_batches(val_ds, ncfg.batch_size, shuffle=False)
        )
        history["loss"].append(m["loss"])
        history["psnr"].append(m["psnr"])
        history["val_loss"].append(v["loss"])
        history["val_psnr"].append(v["psnr"])
        print(f"[ours] epoch {epoch + 1}/{epochs} "
              f"psnr={m['psnr']:.2f} val_psnr={v['psnr']:.2f}", flush=True)
    return {"history": history, "trainer": trainer,
            "val_ds": val_ds, "cfg": ncfg}


def cross_evaluate(weights_path: str, ours: dict) -> dict:
    """Evaluate the reference's TRAINED weights with OUR eval step."""
    import jax

    from nerf_keras_tpu.data.pipeline import iterate_batches
    from nerf_keras_tpu.utils.keras_import import import_reference_weights

    trainer, val_ds, ncfg = ours["trainer"], ours["val_ds"], ours["cfg"]
    params, bn = import_reference_weights(weights_path, ncfg)
    trainer.state = jax.device_put(
        trainer.state._replace(params=params, bn=bn),
        trainer._state_shardings,
    )
    return trainer.evaluate(
        iterate_batches(val_ds, ncfg.batch_size, shuffle=False)
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="config/lego_batch_debug.json")
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--views", type=int, default=16)
    p.add_argument("--out", default="docs/evidence")
    p.add_argument("--npz", default=None,
                   help="use this tiny_nerf_data.npz instead of "
                        "synthesizing the sphere scene — the REAL-Lego "
                        "closure path (scripts/real_data_kit.py): the day "
                        "the capture is reachable, both arms train on it "
                        "unchanged")
    p.add_argument("--report-name", default="parity_report.json")
    args = p.parse_args()

    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")

    with open(os.path.join(REPO, args.config)) as f:
        cfg = json.load(f)
    os.makedirs(args.out, exist_ok=True)

    if args.npz:
        npz_path = args.npz
        print(f"[parity] using provided npz {npz_path}", flush=True)
    else:
        npz_path = os.path.join(args.out, "parity_scene.npz")
        make_scene_npz(npz_path, args.views, cfg["HEIGHT"], cfg["WIDTH"])
        print(f"[parity] scene npz at {npz_path}", flush=True)

    ref = train_reference(npz_path, cfg, args.epochs, args.out)
    print(f"[parity] reference final: "
          f"psnr={ref['history']['psnr'][-1]:.2f} "
          f"val_psnr={ref['history']['val_psnr'][-1]:.2f}", flush=True)

    ours = train_ours(npz_path, cfg, args.epochs)

    cross = cross_evaluate(ref["weights"], ours)
    print(f"[parity] reference weights under OUR eval: "
          f"val_psnr={cross['psnr']:.2f} (keras reported "
          f"{ref['history']['val_psnr'][-1]:.2f})", flush=True)

    import hashlib

    with open(npz_path, "rb") as f:
        npz_sha = hashlib.sha256(f.read()).hexdigest()
    report = {
        "config": args.config,
        "epochs": args.epochs,
        "npz": {"path": os.path.abspath(npz_path), "sha256": npz_sha,
                "provided": bool(args.npz)},
        "scene": {"views": args.views, "height": cfg["HEIGHT"],
                  "width": cfg["WIDTH"]},
        "reference_history": ref["history"],
        "ours_history": ours["history"],
        "cross_eval_reference_weights_our_evaluator": {
            k: float(v) for k, v in cross.items()
        },
    }
    out_path = os.path.join(args.out, args.report_name)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"[parity] report at {out_path}", flush=True)


if __name__ == "__main__":
    main()
