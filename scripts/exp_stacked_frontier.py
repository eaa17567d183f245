"""Fully-stacked speed/quality frontier: proposal + int8 + sample knob.

docs/evidence/quality_frontier.json measured the (samples x int8) plane
and docs/evidence/proposal_evidence.json the (sampler x int8) plane at
flagship samples; this script closes the cube corner — the distilled
proposal sampler, int8 quantization, and reduced sample counts all
stacked — against the parity-path baseline (coarse + float) at the SAME
sample counts, interleaved in-process so tunnel drift cancels
(docs/PERF.md round-3 methodology).

For each ns_coarse+ns_fine combo:
  * restore the trained flagship checkpoint into a trainer with the
    overridden sample counts (the MLP is sample-count agnostic),
  * distill the proposal net + calibrate int8 scales,
  * val-view PSNR vs ground truth for coarse_float and proposal_int8,
    plus proposal_int8 vs coarse_float (the gate-style metric),
  * 800x800 frame wall time, best-of-N interleaved across the two modes.

Usage: python scripts/exp_stacked_frontier.py --checkpoint /tmp/conv80_r3
"""

import argparse
import dataclasses
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
    ap.add_argument("--combos", type=str, default="64+128,64+64,32+64",
                    help="comma list of ns_coarse+ns_fine points")
    ap.add_argument("--frame", type=int, default=800)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--distill-steps", type=int, default=1500)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    ckpt = args.checkpoint
    if not ckpt.endswith(".npz"):
        ckpt = latest_checkpoint(ckpt)
    base_cfg = load_checkpoint_config(ckpt)
    train, val, (near, far), focal = prepare_synthetic_data(
        base_cfg.height, base_cfg.width
    )
    n_px = base_cfg.height * base_cfg.width
    v_img = val.pixels[:n_px].reshape(base_cfg.height, base_cfg.width, 3)
    v_o, v_d = val.origins[:n_px], val.directions[:n_px]

    pose = pose_spherical(30.0, -30.0, 4.0)
    h = w = args.frame
    fr_focal = focal * h / base_cfg.height

    rows = []
    for combo in args.combos.split(","):
        nsc, nsf = (int(x) for x in combo.split("+"))
        cfg = dataclasses.replace(
            base_cfg, ns_coarse=nsc, ns_fine=nsf
        ).validate()
        trainer = Trainer(cfg, near, far).restore(ckpt)

        # Distillation AND int8 activation scales calibrate on orbit rays
        # (the serving-CLI default).  The scored val view must stay held
        # out of calibration: fitting absmax scales to the view whose
        # PSNR is reported makes the number self-calibration-optimistic.
        calib = [
            trainer.pose_rays(pose_spherical(th, -30.0, 4.0), cfg.height,
                              cfg.width, focal)
            for th in range(0, 360, 45)
        ]
        c_o = np.concatenate([c[0] for c in calib], axis=0)
        c_d = np.concatenate([c[1] for c in calib], axis=0)
        trainer.build_proposal_sampler(c_o, c_d, steps=args.distill_steps)
        trainer.quantize_for_inference(c_o, c_d)

        out_b = trainer.render_rays(v_o, v_d, keys=("rgb_fine",),
                                    chunk=args.chunk)
        out_s = trainer.render_rays(v_o, v_d, keys=("rgb_fine",),
                                    chunk=args.chunk, sampler="proposal",
                                    quant=True)
        rgb_b = out_b["rgb_fine"].reshape(v_img.shape)
        rgb_s = out_s["rgb_fine"].reshape(v_img.shape)

        modes = {
            "baseline": dict(sampler="coarse", quant=False),
            "stacked": dict(sampler="proposal", quant=True),
            # the serving configuration (round-4): device-side uint8 rgb
            # + no depth fetch on top of the stacked accelerations
            "stacked_u8": dict(sampler="proposal", quant=True,
                               uint8_rgb=True, need_depth=False),
        }
        times = {k: [] for k in modes}
        for name, kw in modes.items():  # compile/warm both before timing
            trainer.render_image(pose, h, w, fr_focal, chunk=args.chunk, **kw)
            print(f"{nsc}+{nsf}: warmed {name}", flush=True)
        for _ in range(args.reps):
            for name, kw in modes.items():
                t0 = time.perf_counter()
                trainer.render_image(pose, h, w, fr_focal, chunk=args.chunk,
                                     **kw)
                times[name].append(time.perf_counter() - t0)

        row = {
            "ns_coarse": nsc, "ns_fine": nsf,
            "psnr_baseline_vs_gt": psnr(rgb_b, v_img),
            "psnr_stacked_vs_gt": psnr(rgb_s, v_img),
            "psnr_stacked_vs_baseline": psnr(rgb_s, rgb_b),
            "frame_s_baseline_best": min(times["baseline"]),
            "frame_s_stacked_best": min(times["stacked"]),
            "frame_s_stacked_u8_best": min(times["stacked_u8"]),
            "frame_times_baseline": [round(t, 3) for t in times["baseline"]],
            "frame_times_stacked": [round(t, 3) for t in times["stacked"]],
            "frame_times_stacked_u8":
                [round(t, 3) for t in times["stacked_u8"]],
            "speedup": min(times["baseline"]) / min(times["stacked"]),
            "speedup_u8": min(times["baseline"]) / min(times["stacked_u8"]),
        }
        rows.append(row)
        print(f"{nsc}+{nsf}: baseline {row['psnr_baseline_vs_gt']:.2f} dB / "
              f"{row['frame_s_baseline_best']:.3f} s | stacked "
              f"{row['psnr_stacked_vs_gt']:.2f} dB / "
              f"{row['frame_s_stacked_best']:.3f} s "
              f"(u8 {row['frame_s_stacked_u8_best']:.3f} s) "
              f"({row['speedup']:.2f}x, vs-baseline "
              f"{row['psnr_stacked_vs_baseline']:.1f} dB)", flush=True)

    res = {"rows": rows, "frame_px": h, "reps": args.reps,
           "chunk": args.chunk, "distill_steps": args.distill_steps}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
