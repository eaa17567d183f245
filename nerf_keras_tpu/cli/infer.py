"""Novel-view rendering CLI (the reference's inference.py).

Renders a path of camera poses through the fine model and writes a video:

* ``--path orbit`` (default): Blender-style spherical orbit (theta in
  [-45, 45), phi=-30, r=4 — reference inference.py:229-231);
* ``--path spiral``: the LLFF spiral (or, with ``--spherify``, the
  spherified orbit) implied by a forward-facing capture's geometry,
  recovered from ``--data-dir``.  The reference COMPUTES this path
  (fern_data_utils.py:279-288) but then renders Lego-style spheres even
  for its default fern config (inference.py:229-231); wiring it through
  fixes that wart.

Improvements over the reference: the checkpoint is located automatically
(the reference hardcodes a timestamped run dir, inference.py:68-70), frames
render through one compiled chunked function instead of an eager tf.data
loop, and depth videos are optional output.

Inference accelerations (both PSNR-gated on the first frame, falling back
with a warning; they stack):

* ``--quant int8``: both MLP passes through the calibrated int8 MXU
  kernel (ops/quant.py);
* ``--sampler proposal``: fine samples placed by a tiny density net
  distilled from the trained fine model, skipping the coarse MLP pass
  entirely (ops/proposal.py).

``--infer-cache <path>`` persists both artifacts keyed to the weights
(utils/infer_cache.py) so repeat runs skip the rebuild.
"""

from __future__ import annotations

import argparse

import numpy as np

from nerf_keras_tpu.config import config_name, load_config
from nerf_keras_tpu.engine.trainer import Trainer
from nerf_keras_tpu.ops.rays import pose_spherical
from nerf_keras_tpu.utils.checkpoint import (
    resolve_checkpoint,
    load_checkpoint_scene,
)
from nerf_keras_tpu.utils.image import normalize_depth, to_uint8
from nerf_keras_tpu.utils.image_metrics import accuracy_gate
from nerf_keras_tpu.utils.viz import write_video

import jax


def spherical_poses(
    n_frames: int = 30, full_orbit: bool = False,
    phi: float = -30.0, radius: float = 4.0,
) -> list[np.ndarray]:
    """The reference's render path: theta in [-45, 45) (inference.py:229);
    ``full_orbit`` is its commented-out 360 degree variant
    (inference.py:271-310)."""
    lo, hi = (0.0, 360.0) if full_orbit else (-45.0, 45.0)
    return [
        pose_spherical(float(theta), phi, radius)
        for theta in np.linspace(lo, hi, n_frames, endpoint=False)
    ]


def spiral_poses_from_capture(
    data_dir: str, n_frames: int, spherify: bool = False,
) -> list[np.ndarray]:
    """Render path implied by an LLFF capture's geometry: the spiral
    around the average pose (reference ``render_path_spiral``,
    fern_data_utils.py:279-288) or, with ``spherify``, the spherified
    orbit.  Reads only ``poses_bounds.npy`` (no image IO).  Returns
    ``n_frames`` (3, 4) camera-to-world poses subsampled evenly from the
    capture's 120-pose path."""
    from nerf_keras_tpu.data.llff import load_llff_render_path

    render_poses = load_llff_render_path(
        data_dir, recenter=True, spherify=spherify
    )
    idx = np.linspace(0, len(render_poses) - 1, n_frames)
    return [render_poses[int(round(i))][:, :4] for i in idx]


def run_inference(argv: list[str] | None = None) -> str:
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="config/fern_batch_h256.json")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="checkpoint file or run directory")
    p.add_argument("--reference-weights", type=str, default=None,
                   help="a Keras .weights.h5 saved by the TF reference "
                        "(train_lego.py:213); imported into the params "
                        "pytree for parity rendering")
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--path", type=str, default="orbit",
                   choices=("orbit", "spiral"),
                   help="camera path: 'orbit' = Blender-style spherical "
                        "sweep (reference inference.py:229-231); 'spiral' "
                        "= the LLFF path implied by --data-dir's capture "
                        "geometry (fern_data_utils.py:279-288)")
    p.add_argument("--data-dir", type=str, default=None,
                   help="LLFF capture directory (only poses_bounds.npy "
                        "is read); required for --path spiral")
    p.add_argument("--spherify", action="store_true",
                   help="with --path spiral: spherified 360 orbit instead "
                        "of the forward-facing spiral")
    p.add_argument("--full-orbit", action="store_true",
                   help="render a 360 degree orbit instead of the default "
                        "[-45, 45) sweep (reference inference.py:271-310)")
    p.add_argument("--phi", type=float, default=-30.0,
                   help="orbit elevation in degrees (reference: -30)")
    p.add_argument("--radius", type=float, default=4.0,
                   help="orbit camera radius (reference: 4)")
    p.add_argument("--chunk", type=int, default=16384)
    p.add_argument("--near", type=float, default=None,
                   help="near bound (default: checkpoint sidecar, else 2.0)")
    p.add_argument("--far", type=float, default=None,
                   help="far bound (default: checkpoint sidecar, else 6.0)")
    p.add_argument("--focal", type=float, default=None,
                   help="focal length in pixels (default: checkpoint "
                        "sidecar, else 1.2*max(H,W))")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--depth-video", action="store_true")
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform (e.g. 'cpu') before init")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler trace of ONE steady-state "
                        "frame render into DIR (the first frame is rendered "
                        "once untraced first, so compilation stays out of "
                        "the trace); view with tensorboard --logdir DIR")
    p.add_argument("--ns-coarse", type=int, default=None,
                   help="override coarse samples/ray for rendering "
                        "(speed/quality knob; training checkpoint unchanged)")
    p.add_argument("--ns-fine", type=int, default=None,
                   help="override fine samples/ray for rendering")
    p.add_argument("--quant", type=str, default="none",
                   choices=("none", "int8"),
                   help="int8: calibrate on the first pose's rays and run "
                        "both MLP passes through the int8 MXU kernel "
                        "(~2x bf16 peak rate on v5e), gated by "
                        "--quant-gate-db")
    p.add_argument("--quant-gate-db", type=float, default=30.0,
                   help="PSNR gate: the first frame renders both float and "
                        "int8; below this PSNR(int8 vs float) the run "
                        "falls back to the float path with a warning")
    p.add_argument("--quant-calib-rays", type=int, default=2048,
                   help="rays subsampled from the first pose for "
                        "activation-scale calibration")
    p.add_argument("--sampler", type=str, default="coarse",
                   choices=("coarse", "proposal"),
                   help="proposal: distill a tiny density net from the "
                        "trained fine model and use it to place fine "
                        "samples, skipping the coarse MLP pass entirely "
                        "(ops/proposal.py; stacks with --quant int8), "
                        "gated by --sampler-gate-db")
    p.add_argument("--sampler-gate-db", type=float, default=30.0,
                   help="PSNR gate: the first frame renders with both "
                        "samplers; below this PSNR(proposal vs coarse) the "
                        "run falls back to the coarse sampler")
    p.add_argument("--proposal-steps", type=int, default=1500,
                   help="distillation steps for --sampler proposal")
    p.add_argument("--proposal-calib-poses", type=int, default=8,
                   help="poses (evenly spaced along the render path) whose "
                        "rays form the proposal distillation set")
    p.add_argument("--infer-cache", type=str, default=None,
                   help="path to an .infer.npz artifact cache: int8 "
                        "tables / the distilled proposal net are reloaded "
                        "from it when it matches the checkpoint weights "
                        "(sha256-gated), else rebuilt and saved there")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from nerf_keras_tpu.utils.cache import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()

    cfg = load_config(args.config)
    name = config_name(args.config)
    if args.ns_coarse is not None or args.ns_fine is not None:
        # Sample counts are an inference-time speed/quality knob: the MLP
        # weights are sample-count agnostic, so a checkpoint trained at
        # 64+128 renders fine at e.g. 32+64 in ~40% of the time.
        # is-not-None guards: --ns-fine 0 (coarse-only rendering) is a
        # supported value and must not be dropped as falsy.
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            ns_coarse=(
                args.ns_coarse if args.ns_coarse is not None else cfg.ns_coarse
            ),
            ns_fine=args.ns_fine if args.ns_fine is not None else cfg.ns_fine,
        ).validate()

    if (args.checkpoint is None) == (args.reference_weights is None):
        raise SystemExit(
            "exactly one of --checkpoint / --reference-weights is required"
        )
    ckpt = args.checkpoint
    if ckpt is not None and not ckpt.endswith(".npz"):
        found = resolve_checkpoint(ckpt)
        if found is None:
            raise FileNotFoundError(f"no .ckpt.npz under {ckpt}")
        ckpt = found

    # Scene geometry precedence: CLI flag > checkpoint sidecar > Lego-scene
    # defaults (near=2, far=6 — reference lego_data_utils.py:48-49).  The
    # sidecar means a Fern checkpoint renders with Fern bounds untold.
    scene = (load_checkpoint_scene(ckpt) if ckpt else None) or {}
    near = args.near if args.near is not None else scene.get("near", 2.0)
    far = args.far if args.far is not None else scene.get("far", 6.0)
    focal = (
        args.focal if args.focal is not None
        else scene.get("focal", 1.2 * max(cfg.height, cfg.width))
    )
    # Sidecar fields that are load-bearing at render time (state-tree
    # arch, EMA routing, ray space / background) win over the passed
    # config; the LR schedule is neutralized — resolve_infer_config
    # docstring has the full rationale.
    from nerf_keras_tpu.utils.checkpoint import resolve_infer_config

    cfg, notes = resolve_infer_config(cfg, ckpt)
    for note in notes:
        print(f"[nerf-tpu] {note}")
    print(f"[nerf-tpu] scene: near={near:.3f} far={far:.3f} "
          f"focal={focal:.2f}"
          + ("" if scene else " (no sidecar; Lego-scene defaults)"))

    trainer = Trainer(cfg, near, far)
    if ckpt is not None:
        trainer.restore(ckpt)
        print(f"[nerf-tpu] loaded {ckpt}")
    else:
        from nerf_keras_tpu.utils.keras_import import import_reference_weights

        if cfg.train_sampler == "proposal":
            raise SystemExit(
                "--reference-weights carries a coarse+fine pair; it cannot "
                "load into a TRAIN_SAMPLER='proposal' config (no coarse "
                "model) — use the default coarse config for parity renders"
            )
        params, bn = import_reference_weights(args.reference_weights, cfg)
        trainer.replace_params(params, bn)
        print(f"[nerf-tpu] imported reference weights {args.reference_weights}")

    frames, depth_frames = [], []
    if args.path == "spiral":
        if not args.data_dir:
            raise SystemExit("--path spiral requires --data-dir "
                             "(LLFF capture with poses_bounds.npy)")
        poses = spiral_poses_from_capture(
            args.data_dir, args.frames,
            spherify=args.spherify,
        )
    else:
        poses = spherical_poses(
            args.frames, full_orbit=args.full_orbit, phi=args.phi,
            radius=args.radius,
        )
    if args.infer_cache:
        # Reuse weight-matched artifacts (sha256-gated); a stale file is
        # ignored and overwritten by the fresh build below.
        from nerf_keras_tpu.utils import io as nio
        from nerf_keras_tpu.utils.infer_cache import StaleArtifactsError

        if nio.exists(args.infer_cache):
            try:
                trainer.load_inference_artifacts(args.infer_cache)
                print(f"[nerf-tpu] loaded inference artifacts from "
                      f"{args.infer_cache}")
            except StaleArtifactsError as e:
                print(f"[nerf-tpu] ignoring artifact cache: {e}")
    cache_pre = (trainer.quant_ready, trainer.proposal_ready)
    use_quant = False
    if args.quant == "int8":
        # Calibrate on the first pose's rays, then gate: render the first
        # frame BOTH ways and require PSNR(int8 vs float) >= the gate —
        # a silent-degradation guard the float path never needs.
        if not trainer.quant_ready:  # else: loaded from --infer-cache
            # Calibrate across poses spread along the render path (the
            # gate view poses[0] alone would self-calibrate the gate).
            cstep = max(1, len(poses) // 4)
            calib = [trainer.pose_rays(p_, cfg.height, cfg.width, focal)
                     for p_ in poses[::cstep][:4]]
            trainer.quantize_for_inference(
                np.concatenate([c[0] for c in calib], axis=0),
                np.concatenate([c[1] for c in calib], axis=0),
                calib_rays=args.quant_calib_rays,
            )
        ref_rgb = trainer.render_image(
            poses[0], cfg.height, cfg.width, focal, chunk=args.chunk
        )["rgb"]
        q_rgb = trainer.render_image(
            poses[0], cfg.height, cfg.width, focal, chunk=args.chunk,
            quant=True,
        )["rgb"]
        use_quant, _ = accuracy_gate(
            ref_rgb, q_rgb, args.quant_gate_db, "int8",
            "falling back to the float path",
        )
    use_sampler = "coarse"
    if args.sampler == "proposal" and trainer.online_proposal:
        # TRAIN_SAMPLER='proposal' checkpoint: the in-state proposal net
        # already places samples on EVERY render (there is no coarse
        # sampler to gate against) — nothing to distill.
        print("[nerf-tpu] proposal-trained checkpoint: renders already "
              "use the in-state proposal net")
    elif args.sampler == "proposal":
        # Distill on rays from several poses along the render path (a
        # frustum the proposal never saw is one it can only extrapolate
        # into), then gate against the coarse sampler at the already-
        # decided quant setting — isolating the proposal's own effect.
        if not trainer.proposal_ready:  # else: loaded from --infer-cache
            step = max(1, len(poses) // args.proposal_calib_poses)
            calib = [trainer.pose_rays(p_, cfg.height, cfg.width, focal)
                     for p_ in poses[::step][:args.proposal_calib_poses]]
            o_c = np.concatenate([c[0] for c in calib], axis=0)
            d_c = np.concatenate([c[1] for c in calib], axis=0)
            trainer.build_proposal_sampler(
                o_c, d_c, steps=args.proposal_steps
            )
        ref_rgb = trainer.render_image(
            poses[0], cfg.height, cfg.width, focal, chunk=args.chunk,
            quant=use_quant,
        )["rgb"]
        p_rgb = trainer.render_image(
            poses[0], cfg.height, cfg.width, focal, chunk=args.chunk,
            quant=use_quant, sampler="proposal",
        )["rgb"]
        ok, _ = accuracy_gate(
            ref_rgb, p_rgb, args.sampler_gate_db, "proposal",
            "falling back to the coarse sampler",
        )
        if ok:
            use_sampler = "proposal"
    if args.infer_cache and (
        (trainer.quant_ready, trainer.proposal_ready) != cache_pre
        and (trainer.quant_ready or trainer.proposal_ready)
    ):
        trainer.save_inference_artifacts(args.infer_cache)
        print(f"[nerf-tpu] saved inference artifacts to {args.infer_cache}")
    def render(pose):
        # Device-side uint8 conversion + depth fetch only when the depth
        # video consumes it: the end-of-frame fetch payload drops 4x
        # (16x without depth), which is the dominant residual transfer
        # term on the tunnel (docs/PERF.md round-4).
        return trainer.render_image(pose, cfg.height, cfg.width, focal,
                                    chunk=args.chunk, quant=use_quant,
                                    sampler=use_sampler, uint8_rgb=True,
                                    need_depth=args.depth_video)

    for i, pose in enumerate(poses):
        if args.profile is not None and i == 0:
            # Steady-state trace (SURVEY.md §5 tracing row): render once
            # untraced so the trace window holds the compiled per-chunk
            # pipeline, not one-time compilation.
            from nerf_keras_tpu.utils import profiling

            render(pose)
            with profiling.trace(args.profile):
                out = render(pose)
            print(f"[nerf-tpu] profiler trace of one "
                  f"{cfg.height}x{cfg.width} frame -> {args.profile}")
        else:
            out = render(pose)
        frames.append(to_uint8(out["rgb"]))
        if args.depth_video:
            depth_frames.append(to_uint8(normalize_depth(out["depth"])))
        print(f"  frame {i + 1}/{args.frames}")

    out_path = args.out or f"{name}_rgb_video_tpu.mp4"
    written = write_video(out_path, frames, fps=30)
    print(f"[nerf-tpu] video saved to {written}")
    if depth_frames:
        import os

        base, ext = os.path.splitext(out_path)
        dpath = write_video(f"{base}_depth{ext or '.mp4'}", depth_frames, fps=30)
        print(f"[nerf-tpu] depth video saved to {dpath}")
    return written
