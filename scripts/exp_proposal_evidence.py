"""Proposal-sampler evidence on the real TPU: accuracy + frame A/B.

Loads the TRAINED flagship checkpoint (80-epoch synthetic run), then:

1. distills the proposal net (ops/proposal.py) on rays from 8 orbit
   poses, reporting the distillation wall time (the one-time cost a
   server pays at startup);
2. renders the held-out val view through all four serving configurations
   — {coarse, proposal} x {float, int8} — and reports PSNR vs ground
   truth for each + PSNR(proposal vs coarse), the CLI gate metric;
3. times an 800x800 frame end-to-end for the four configurations,
   interleaved best-of-N (tunnel drift makes non-interleaved timings
   meaningless — docs/PERF.md round-3).

Usage: python scripts/exp_proposal_evidence.py --checkpoint /tmp/conv80_r3
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


MODES = (
    ("coarse", False), ("proposal", False),
    ("coarse", True), ("proposal", True),
)


def _name(sampler, quant):
    return f"{sampler}_{'int8' if quant else 'float'}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", type=str, default="/tmp/conv80_r3")
    ap.add_argument("--frame", type=int, default=800)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--steps", type=int, default=1500)
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

    n_px = cfg.height * cfg.width
    v_img = val.pixels[:n_px].reshape(cfg.height, cfg.width, 3)
    v_o, v_d = val.origins[:n_px], val.directions[:n_px]

    # Distill on rays from 8 poses around the render orbit (the CLI's
    # --proposal-calib-poses default), timed separately: jit+scan compile
    # vs the re-distill cost a warm server would pay.
    calib = [
        trainer.pose_rays(pose_spherical(th, -30.0, 4.0), cfg.height,
                          cfg.width, focal)
        for th in range(0, 360, 45)
    ]
    o_c = np.concatenate([c[0] for c in calib], axis=0)
    d_c = np.concatenate([c[1] for c in calib], axis=0)
    t0 = time.perf_counter()
    trainer.build_proposal_sampler(o_c, d_c, steps=args.steps)
    distill_s = time.perf_counter() - t0
    print(f"distill: {distill_s:.1f} s (steps={args.steps}, "
          f"loss={trainer._distill_loss:.4f})", flush=True)

    trainer.quantize_for_inference(v_o, v_d)

    rgbs = {}
    for sampler, quant in MODES:
        out = trainer.render_rays(v_o, v_d, keys=("rgb_fine",),
                                  sampler=sampler, quant=quant)
        rgbs[_name(sampler, quant)] = out["rgb_fine"].reshape(
            cfg.height, cfg.width, 3
        )
    res = {"distill_s": distill_s, "distill_steps": args.steps,
           "distill_loss": trainer._distill_loss}
    for name, rgb in rgbs.items():
        res[f"psnr_{name}_vs_gt"] = psnr(rgb, v_img)
    res["psnr_proposal_vs_coarse_float"] = psnr(
        rgbs["proposal_float"], rgbs["coarse_float"]
    )
    res["psnr_proposal_vs_coarse_int8"] = psnr(
        rgbs["proposal_int8"], rgbs["coarse_int8"]
    )
    for k, v in res.items():
        if k.startswith("psnr"):
            print(f"{k:32s} {v:7.2f} dB", flush=True)

    # 800x800 frame wall-time, all four configurations interleaved.
    pose = pose_spherical(30.0, -30.0, 4.0)
    h = w = args.frame
    fr_focal = focal * h / cfg.height
    times = {_name(s, q): [] for s, q in MODES}
    for s, q in MODES:  # compile/warm all four first
        trainer.render_image(pose, h, w, fr_focal, sampler=s, quant=q)
        print(f"warmed {_name(s, q)}", flush=True)
    for _ in range(args.reps):
        for s, q in MODES:
            t0 = time.perf_counter()
            trainer.render_image(pose, h, w, fr_focal, sampler=s, quant=q)
            times[_name(s, q)].append(time.perf_counter() - t0)
    for name, ts in times.items():
        res[f"frame_s_{name}_best"] = min(ts)
        print(f"frame {h}x{w} {name}: best {min(ts):.3f} s "
              f"(all: {[round(t, 3) for t in ts]})", flush=True)
    res["frame_px"] = h
    res["reps"] = args.reps
    res["speedup_proposal_float"] = (
        res["frame_s_coarse_float_best"] / res["frame_s_proposal_float_best"]
    )
    res["speedup_proposal_int8_vs_coarse_float"] = (
        res["frame_s_coarse_float_best"] / res["frame_s_proposal_int8_best"]
    )
    print(f"proposal float speedup: {res['speedup_proposal_float']:.3f}x; "
          f"proposal+int8 vs baseline: "
          f"{res['speedup_proposal_int8_vs_coarse_float']:.3f}x", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
