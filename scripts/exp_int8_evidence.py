"""int8 inference evidence on the real TPU: accuracy gate + frame A/B.

Loads a TRAINED flagship checkpoint (80-epoch synthetic run), then:

1. renders a held-out val view through the float and int8 paths and
   reports PSNR vs ground truth for both + PSNR(int8 vs float) — the
   quantization gate the CLI applies;
2. times an 800x800 frame end-to-end (trainer.render_image wall time,
   chunk 16384) float vs int8, interleaved best-of-N.

Usage: python scripts/exp_int8_evidence.py --checkpoint /tmp/conv80_r3
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nerf_keras_tpu.data.synthetic import prepare_synthetic_data
from nerf_keras_tpu.engine.trainer import Trainer
from nerf_keras_tpu.ops.rays import pose_spherical
from nerf_keras_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint_config,
)


def psnr(a, b):
    m = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return float("inf") if m == 0 else -10.0 * np.log10(m)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", type=str, default="/tmp/conv80_r3")
    ap.add_argument("--frame", type=int, default=800)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    ckpt = args.checkpoint
    if not ckpt.endswith(".npz"):
        ckpt = latest_checkpoint(ckpt)
    cfg = load_checkpoint_config(ckpt)
    train, val, (near, far), focal = prepare_synthetic_data(
        cfg.height, cfg.width
    )
    trainer = Trainer(cfg, near, far).restore(ckpt)
    print(f"loaded {ckpt} (h={cfg.height} ns={cfg.ns_coarse}+{cfg.ns_fine})",
          flush=True)

    # Val view 0: rays are stored flattened per view.
    n_px = cfg.height * cfg.width
    v_img = val.pixels[:n_px].reshape(cfg.height, cfg.width, 3)
    v_o, v_d = val.origins[:n_px], val.directions[:n_px]

    # Calibrate on TRAIN rays: the scored val view stays held out
    # (self-calibration made the reported PSNR optimistic).
    trainer.quantize_for_inference(train.origins, train.directions)
    out_f = trainer.render_rays(v_o, v_d, keys=("rgb_fine",))
    out_q = trainer.render_rays(v_o, v_d, keys=("rgb_fine",), quant=True)
    rgb_f = out_f["rgb_fine"].reshape(cfg.height, cfg.width, 3)
    rgb_q = out_q["rgb_fine"].reshape(cfg.height, cfg.width, 3)
    res = {
        "psnr_float_vs_gt": psnr(rgb_f, v_img),
        "psnr_int8_vs_gt": psnr(rgb_q, v_img),
        "psnr_int8_vs_float": psnr(rgb_q, rgb_f),
    }
    for k, v in res.items():
        print(f"{k:22s} {v:7.2f} dB", flush=True)

    # 800x800 frame wall-time A/B, interleaved.
    pose = pose_spherical(30.0, -30.0, 4.0)
    h = w = args.frame
    fr_focal = focal * h / cfg.height
    times = {"float": [], "int8": []}
    for mode in ("float", "int8"):  # warmup/compile both first
        trainer.render_image(pose, h, w, fr_focal, quant=mode == "int8")
    for _ in range(args.reps):
        for mode in ("float", "int8"):
            t0 = time.perf_counter()
            trainer.render_image(pose, h, w, fr_focal, quant=mode == "int8")
            times[mode].append(time.perf_counter() - t0)
    for mode, ts in times.items():
        print(f"frame {h}x{w} {mode}: best {min(ts):.3f} s "
              f"(all: {[round(t, 3) for t in ts]})", flush=True)
    res["frame_s_float_best"] = min(times["float"])
    res["frame_s_int8_best"] = min(times["int8"])
    res["frame_speedup"] = min(times["float"]) / min(times["int8"])
    res["frame_px"] = h
    res["reps"] = args.reps
    print(f"speedup: {res['frame_speedup']:.3f}x", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
