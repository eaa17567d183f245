"""Held-out-view evaluation CLI (beyond-reference).

Renders every view of a dataset split from a trained checkpoint and
reports per-view PSNR / SSIM / MSE plus split means, written as JSON —
the standard NeRF paper-table protocol.  The reference scores only
ray-batch PSNR inside its training loop (train_lego.py:161-181); it has
no way to evaluate a checkpoint after the fact.

The accelerated inference paths (``--quant int8``, ``--sampler
proposal``) are accepted UNGATED here, unlike cli/infer.py's PSNR-gated
video renders: evaluation against ground truth IS the quality
measurement, so the report itself shows any degradation instead of a
gate hiding it.

    python evaluate.py --config <json> --checkpoint <run-dir> \
        --data synthetic --split val --out /tmp/eval.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from nerf_keras_tpu.config import load_config
from nerf_keras_tpu.engine.trainer import Trainer
from nerf_keras_tpu.utils import io
from nerf_keras_tpu.utils.checkpoint import (
    resolve_checkpoint,
    load_checkpoint_scene,
    resolve_infer_config,
)
from nerf_keras_tpu.utils.image_metrics import ssim

import jax
import jax.numpy as jnp


def _prepare(data: str, height: int, width: int, data_dir: str | None,
             *, white_bkgd: bool = False, split: str = "val",
             scene: str | None = None):
    """(train_ds, val_ds, (near, far), focal) for the named dataset.

    ``scene`` is dataset-relative: a nerf_synthetic scene directory for
    ``--data blender`` (default "lego"), a procedural variant for
    ``--data synthetic`` (default "sphere") — a checkpoint trained with
    ``train_synthetic.py --scene spheres`` must be scored against the
    same variant's ground truth."""
    if data == "synthetic":
        from nerf_keras_tpu.data.synthetic import prepare_synthetic_data

        return prepare_synthetic_data(height, width, scene=scene or "sphere")
    if data == "lego":
        from nerf_keras_tpu.data.lego import prepare_lego_data

        return prepare_lego_data(height, width, path=data_dir)
    if data == "blender":
        from nerf_keras_tpu.data.blender import prepare_blender_data

        # Paper-table scoring uses the full test split; default val stays
        # subsampled so routine eval is cheap.
        kw = {"val_split": "test", "val_every": 1} if split == "test" else {}
        return prepare_blender_data(
            height, width, path=data_dir, scene=scene or "lego",
            white_bkgd=white_bkgd, **kw
        )
    if data == "llff":
        from nerf_keras_tpu.data.llff import prepare_fern_data

        return prepare_fern_data(height, width, basedir=data_dir)
    raise SystemExit(f"unknown --data {data!r}")


def evaluate_views(
    trainer: Trainer,
    ds,
    chunk: int = 16384,
    quant: bool = False,
    sampler: str = "coarse",
    save_dir: str | None = None,
    split: str = "val",
) -> dict:
    """Render every view in ``ds`` and score it against ground truth.

    Returns ``{"views": [{view, mse, psnr, ssim?}, ...], "mean": {...}}``;
    SSIM is included when the 11x11 window fits the frame.  With
    ``save_dir`` each pred/gt pair is written as PNG inside the loop —
    frames are never all held in host memory (a full 200-view 800x800
    test split would be ~1.5 GB).
    """
    views = []
    with_ssim = min(ds.height, ds.width) >= 11
    if save_dir is not None:
        io.makedirs(save_dir)
    for i in range(ds.num_images):
        o, d = ds.image_rays(i)
        out = trainer.render_rays(
            o, d, chunk=chunk, keys=("rgb_fine",), quant=quant,
            sampler=sampler,
        )
        pred = np.asarray(out["rgb_fine"], np.float32).reshape(
            ds.height, ds.width, 3
        )
        gt = ds.image(i)
        mse = float(np.mean((pred - gt) ** 2))
        row = {
            "view": i,
            "mse": mse,
            "psnr": float("inf") if mse == 0 else float(-10.0 * np.log10(mse)),
        }
        if with_ssim:
            row["ssim"] = float(ssim(jnp.asarray(pred), jnp.asarray(gt)))
        views.append(row)
        if save_dir is not None:
            from nerf_keras_tpu.utils.image import to_uint8
            from nerf_keras_tpu.utils.viz import save_png

            save_png(
                io.join(save_dir, f"{split}_{i:03d}_pred.png"),
                to_uint8(pred),
            )
            save_png(
                io.join(save_dir, f"{split}_{i:03d}_gt.png"), to_uint8(gt)
            )

    mean = {
        k: float(np.mean([v[k] for v in views]))
        for k in views[0]
        if k != "view"
    }
    return {"views": views, "mean": mean}


def run_evaluation(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True,
                   help="checkpoint file or run directory")
    p.add_argument("--data", type=str, default="synthetic",
                   choices=("synthetic", "lego", "blender", "llff"))
    p.add_argument("--data-dir", type=str, default=None,
                   help="dataset root (lego/blender/llff)")
    p.add_argument("--scene", type=str, default=None,
                   help="dataset-relative scene: a directory under a "
                        "nerf_synthetic root (--data blender, default "
                        "'lego') or a procedural variant (--data synthetic: "
                        "'sphere'/'spheres', default 'sphere')")
    p.add_argument("--split", type=str, default="val",
                   choices=("val", "train", "test"),
                   help="'test' = the full Blender test split (the split "
                        "published nerf_synthetic numbers use; --data "
                        "blender only)")
    p.add_argument("--chunk", type=int, default=16384)
    p.add_argument("--out", type=str, default=None,
                   help="metrics JSON path (default: "
                        "<checkpoint dir>/eval_<split>.json)")
    p.add_argument("--save-images", type=str, default=None,
                   help="directory for per-view pred/gt PNG pairs")
    p.add_argument("--quant", type=str, default="none",
                   choices=("none", "int8"),
                   help="score the int8 inference path (activation scales "
                        "calibrated on held-out TRAIN views)")
    p.add_argument("--sampler", type=str, default="coarse",
                   choices=("coarse", "proposal"),
                   help="score the distilled-proposal inference path")
    p.add_argument("--proposal-steps", type=int, default=1500)
    p.add_argument("--infer-cache", type=str, default=None,
                   help="weight-keyed .infer.npz artifact cache "
                        "(utils/infer_cache.py), loaded when fresh, "
                        "rebuilt+saved when stale/absent")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from nerf_keras_tpu.utils.cache import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()

    cfg = load_config(args.config)
    ckpt = args.checkpoint
    if not ckpt.endswith(".npz"):
        found = resolve_checkpoint(ckpt)
        if found is None:
            raise FileNotFoundError(f"no .ckpt.npz under {ckpt}")
        ckpt = found

    scene = load_checkpoint_scene(ckpt) or {}
    cfg, notes = resolve_infer_config(cfg, ckpt)
    for note in notes:
        print(f"[nerf-tpu] {note}")

    if args.split == "test" and args.data != "blender":
        raise SystemExit("--split test requires --data blender")
    train_ds, val_ds, (near, far), _focal = _prepare(
        args.data, cfg.height, cfg.width, args.data_dir,
        white_bkgd=cfg.white_bkgd, split=args.split, scene=args.scene,
    )
    ds = train_ds if args.split == "train" else val_ds
    near = scene.get("near", near)
    far = scene.get("far", far)
    if cfg.ndc:
        # The checkpoint was trained on NDC-reparameterized rays
        # (cli/train.py applies dataset_to_ndc before training): score it
        # in the SAME ray space, or every view renders garbage and the
        # report records meaningless metrics without an error.  Bounds
        # become [0, 1] exactly as at training time.
        from nerf_keras_tpu.data.pipeline import dataset_to_ndc

        ds = dataset_to_ndc(ds)
        near, far = 0.0, 1.0

    trainer = Trainer(cfg, near, far).restore(ckpt)
    print(f"[nerf-tpu] loaded {ckpt}; scoring {ds.num_images} "
          f"{args.split} views at {ds.height}x{ds.width}")

    if args.infer_cache:
        from nerf_keras_tpu.utils.infer_cache import StaleArtifactsError

        if io.exists(args.infer_cache):
            try:
                trainer.load_inference_artifacts(args.infer_cache)
                print(f"[nerf-tpu] loaded inference artifacts from "
                      f"{args.infer_cache}")
            except StaleArtifactsError as e:
                print(f"[nerf-tpu] ignoring artifact cache: {e}")
    def _calib_rays():
        # Held-out calibration: weight-derived inference state (int8
        # activation scales, the distilled proposal net) is fit on TRAIN
        # views, never the scored split — self-calibration biases the
        # reported eval PSNR optimistic, and the LLFF val split is a
        # SINGLE view so the bias there is total.  Up to 8 views spread
        # over the split, matching cli/infer.py's multi-pose calibration.
        cds = train_ds
        if cfg.ndc:
            from nerf_keras_tpu.data.pipeline import dataset_to_ndc

            cds = dataset_to_ndc(cds)
        idx = list(range(0, cds.num_images, max(1, cds.num_images // 8)))[:8]
        pairs = [cds.image_rays(i) for i in idx]
        return (np.concatenate([p[0] for p in pairs], axis=0),
                np.concatenate([p[1] for p in pairs], axis=0))

    cache_pre = (trainer.quant_ready, trainer.proposal_ready)
    if args.quant == "int8" and not trainer.quant_ready:
        trainer.quantize_for_inference(*_calib_rays())
    sampler = args.sampler
    if sampler == "proposal" and trainer.online_proposal:
        sampler = "coarse"  # renders already use the in-state proposal net
    elif sampler == "proposal" and not trainer.proposal_ready:
        o_c, d_c = _calib_rays()
        trainer.build_proposal_sampler(o_c, d_c, steps=args.proposal_steps)
    if args.infer_cache and (
        (trainer.quant_ready, trainer.proposal_ready) != cache_pre
    ):
        trainer.save_inference_artifacts(args.infer_cache)
        print(f"[nerf-tpu] saved inference artifacts to {args.infer_cache}")

    report = evaluate_views(
        trainer, ds, chunk=args.chunk,
        quant=args.quant == "int8", sampler=sampler,
        save_dir=args.save_images, split=args.split,
    )
    report["split"] = args.split
    report["checkpoint"] = ckpt
    report["quant"] = args.quant
    report["sampler"] = args.sampler

    out_path = args.out or io.join(
        ckpt.rsplit("/", 1)[0] if "/" in ckpt else ".",
        f"eval_{args.split}.json",
    )
    with io.open_file(out_path, "w") as f:
        json.dump(report, f, indent=1)
    m = report["mean"]
    ssim_txt = f" ssim={m['ssim']:.4f}" if "ssim" in m else ""
    print(f"[nerf-tpu] {args.split}: psnr={m['psnr']:.2f}{ssim_txt} "
          f"({ds.num_images} views) -> {out_path}")
    return report
