"""Minimal production render server (beyond-reference capability).

The reference ships no serving layer (its requirements list gradio/fastapi
but never imports them — SURVEY.md §2.7).  This module provides a
dependency-free HTTP render endpoint over a trained checkpoint, suitable
for smoke-serving a model from a TPU VM:

    python -m nerf_keras_tpu.serving --config config/lego_batch_h256.json \
        --checkpoint models/<run> --port 8042

    GET /render?theta=30&phi=-30&radius=4&width=200&height=200  -> PNG
    GET /render?...&map=depth        -> normalized depth map as PNG
    GET /healthz                                                -> 200 ok
    GET /stats                                                  -> JSON
    POST /reload                     -> re-resolve + install the latest
                                        checkpoint (hot reload while a
                                        training job keeps writing)

Design: stdlib ``http.server`` with a threading mixin for concurrent
connections; render requests serialize through a lock onto the single
jitted chunked renderer (one compiled program per (H, W-chunk) shape —
repeated sizes hit the jit cache).  For real fleets put this behind a
batching frontend; the per-request path here is the same
``Trainer.render_image`` the CLI uses.

Measured under concurrency (round 5, real v5e via the axon tunnel,
200x200 frames, proposal serving config — scripts/
exp_serving_concurrency.py, docs/evidence/serving_concurrency.json):
one client sustains 1.10 fps (p50 0.95 s, device duty 0.98); a SECOND
client doubles throughput to 2.37 fps at LOWER p50 (0.82 s) — the
overlapped request hides the per-chunk tunnel round-trips a single
client pays serially.  Beyond two clients the device is saturated
(duty 0.99, throughput flat at ~2.2-2.4 fps) and p50 grows linearly
with queue depth (c=4: 1.78 s, c=8: 3.30 s).  Request COALESCING
(batching queued rays into one chunk stream) therefore cannot add
device throughput here — the serialized renderer already covers ~99%
of the wall clock from c=2 up; its only win would be merging the
sub-chunk tails of small frames, bounded by the c=1 -> c=2 gap.  If
you need lower p99 under load, add chips (data-parallel frame
sharding, docs/DISTRIBUTED.md), not request merging.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from nerf_keras_tpu.utils.image_metrics import accuracy_gate


class RenderService:
    """Owns the Trainer + checkpoint; thread-safe render calls."""

    def __init__(
        self, cfg, checkpoint: str,
        near: float | None = None, far: float | None = None,
        quant: bool = False, quant_gate_db: float = 30.0,
        sampler: str = "coarse", sampler_gate_db: float = 30.0,
        proposal_steps: int = 1500, infer_cache: str | None = None,
    ):
        # Remember the request so a hot reload (POST /reload) can re-run
        # the exact same resolution + gating against a newer checkpoint.
        self._arg_checkpoint = checkpoint
        self._arg_cfg = cfg
        self._arg_near, self._arg_far = near, far
        self._quant_requested = quant
        self._quant_gate_db = quant_gate_db
        self._sampler_requested = sampler
        self._sampler_gate_db = sampler_gate_db
        self._proposal_steps = proposal_steps
        self._infer_cache = infer_cache
        self._lock = threading.Lock()
        self.requests = 0
        self.total_render_s = 0.0
        self.reloads = 0
        self.trainer = None
        self.cfg = None
        self.checkpoint = None
        self.near = self.far = None
        self._install()

    def _install(self) -> None:
        """Resolve the latest checkpoint from the original request and
        install it: build/reuse the Trainer, load/derive the gated
        acceleration artifacts.  Callers hold ``_lock`` (or are the
        constructor, before the server exists)."""
        from nerf_keras_tpu.engine.trainer import Trainer
        from nerf_keras_tpu.utils import io as nio
        from nerf_keras_tpu.utils.checkpoint import (
            resolve_checkpoint,
            load_checkpoint_scene,
            resolve_infer_config,
        )
        from nerf_keras_tpu.utils.infer_cache import StaleArtifactsError

        checkpoint = self._arg_checkpoint
        if not checkpoint.endswith(".npz"):
            found = resolve_checkpoint(checkpoint)
            if found is None:
                raise FileNotFoundError(f"no .ckpt.npz under {checkpoint}")
            checkpoint = found
        # scene bounds: explicit args > checkpoint sidecar > Lego defaults
        scene = load_checkpoint_scene(checkpoint) or {}
        near = (
            self._arg_near if self._arg_near is not None
            else scene.get("near", 2.0)
        )
        far = (
            self._arg_far if self._arg_far is not None
            else scene.get("far", 6.0)
        )
        self.default_focal = scene.get("focal")
        # Render-time-load-bearing sidecar fields (state-tree arch, EMA
        # routing) win over the passed config; the LR schedule is
        # neutralized — resolve_infer_config docstring.
        cfg, notes = resolve_infer_config(self._arg_cfg, checkpoint)
        for note in notes:
            print(f"[nerf-tpu] {note}")
        if (
            self.trainer is not None
            and cfg == self.cfg
            and (near, far) == (self.near, self.far)
        ):
            # Hot-reload fast path: same wiring/bounds -> restore into the
            # existing trainer and keep every compiled render program.
            self.trainer.restore(checkpoint)
        else:
            self.trainer = Trainer(cfg, near, far).restore(checkpoint)
        self.checkpoint = checkpoint
        self.cfg = cfg
        self.near, self.far = near, far
        # Artifact cache: int8 tables + distilled proposal net are pure
        # functions of the checkpoint weights (utils/infer_cache.py) —
        # a restart reuses them instead of paying the ~20 s rebuild.  A
        # digest mismatch (new weights) is IGNORED with a notice, and the
        # fresh build below overwrites the file.
        infer_cache = self._infer_cache
        if infer_cache and nio.exists(infer_cache):
            try:
                self.trainer.load_inference_artifacts(infer_cache)
                print(f"[nerf-tpu] loaded inference artifacts from "
                      f"{infer_cache}")
            except StaleArtifactsError as e:
                print(f"[nerf-tpu] ignoring artifact cache: {e}")
        pre = (self.trainer.quant_ready, self.trainer.proposal_ready)
        self.use_quant = False
        if self._quant_requested:
            self.use_quant = self._setup_quant(self._quant_gate_db)
        self.use_sampler = "coarse"
        if (
            self._sampler_requested == "proposal"
            and self.trainer.online_proposal
        ):
            # TRAIN_SAMPLER='proposal' checkpoint: every render already
            # uses the in-state proposal net; nothing to distill or gate.
            print("[nerf-tpu] proposal-trained checkpoint: renders "
                  "already use the in-state proposal net")
        elif self._sampler_requested == "proposal":
            self.use_sampler = self._setup_proposal(
                self._sampler_gate_db, self._proposal_steps
            )
        post = (self.trainer.quant_ready, self.trainer.proposal_ready)
        if infer_cache and post != pre and any(post):
            self.trainer.save_inference_artifacts(infer_cache)
            print(f"[nerf-tpu] saved inference artifacts to {infer_cache}")

    def reload(self) -> dict:
        """Re-resolve the original checkpoint request and install the
        newest checkpoint (hot reload: a long-lived server picks up what
        the training job keeps writing).  Always reinstalls — an explicit
        operator action, idempotent — and re-runs the int8/proposal
        gates against the new weights.  Same wiring + bounds keep every
        compiled render program (Trainer.restore); a changed config or
        scene rebuilds the trainer."""
        with self._lock:
            previous = self.checkpoint
            self._install()
            self.reloads += 1
            return {
                "previous": previous,
                "checkpoint": self.checkpoint,
                "changed": self.checkpoint != previous,
                "quant": "int8" if self.use_quant else "none",
                "sampler": self.use_sampler,
            }

    def _setup_quant(self, gate_db: float) -> bool:
        """Calibrate the int8 render path on the default serving pose and
        gate it against the float render (PSNR); serves float with a
        warning if the gate fails."""
        from nerf_keras_tpu.ops.rays import pose_spherical

        pose = pose_spherical(0.0, -30.0, 4.0)
        h, w = self.cfg.height, self.cfg.width
        focal = self.default_focal or 1.2 * max(h, w)
        if not self.trainer.quant_ready:  # else: loaded from infer_cache
            # Calibrate activation scales across an orbit of serving
            # poses (like _setup_proposal), not just the gate view —
            # scales fit to the single scored view make the gate
            # self-calibration-optimistic and can clip on other poses.
            calib = [
                self.trainer.pose_rays(
                    pose_spherical(theta, -30.0, 4.0), h, w, focal
                )
                for theta in range(0, 360, 45)
            ]
            self.trainer.quantize_for_inference(
                np.concatenate([c[0] for c in calib], axis=0),
                np.concatenate([c[1] for c in calib], axis=0),
            )
        ref = self.trainer.render_image(pose, h, w, focal)["rgb"]
        q = self.trainer.render_image(pose, h, w, focal, quant=True)["rgb"]
        ok, _ = accuracy_gate(ref, q, gate_db, "serving int8",
                              "serving the float path")
        return ok

    def _setup_proposal(self, gate_db: float, steps: int) -> str:
        """Distill the proposal sampler (ops/proposal.py) on rays from an
        orbit of serving poses and gate it against the coarse-sampled
        render at the already-decided quant setting."""
        from nerf_keras_tpu.ops.rays import pose_spherical

        h, w = self.cfg.height, self.cfg.width
        focal = self.default_focal or 1.2 * max(h, w)
        if not self.trainer.proposal_ready:  # else: loaded from infer_cache
            calib = [
                self.trainer.pose_rays(
                    pose_spherical(theta, -30.0, 4.0), h, w, focal
                )
                for theta in range(0, 360, 45)
            ]
            self.trainer.build_proposal_sampler(
                np.concatenate([c[0] for c in calib], axis=0),
                np.concatenate([c[1] for c in calib], axis=0),
                steps=steps,
            )
        pose = pose_spherical(0.0, -30.0, 4.0)
        ref = self.trainer.render_image(
            pose, h, w, focal, quant=self.use_quant
        )["rgb"]
        p = self.trainer.render_image(
            pose, h, w, focal, quant=self.use_quant, sampler="proposal"
        )["rgb"]
        ok, _ = accuracy_gate(ref, p, gate_db, "serving proposal sampler",
                              "serving the coarse sampler")
        return "proposal" if ok else "coarse"

    def render_png(
        self, theta: float, phi: float, radius: float,
        height: int, width: int, chunk: int = 16384,
        focal: float | None = None, map_name: str = "rgb",
    ) -> bytes:
        from PIL import Image

        from nerf_keras_tpu.ops.rays import pose_spherical
        from nerf_keras_tpu.utils.image import normalize_depth, to_uint8

        if map_name not in ("rgb", "depth"):
            raise ValueError(f"unknown map {map_name!r} (rgb|depth)")

        pose = pose_spherical(theta, phi, radius)
        if focal is None:
            # sidecar focal was recorded at the TRAINING resolution; scale
            # it to the requested frame so the FOV matches training
            if self.default_focal is not None:
                focal = self.default_focal * max(height, width) / max(
                    self.cfg.height, self.cfg.width
                )
            else:
                focal = 1.2 * max(height, width)
        with self._lock:  # single accelerator; serialize device work
            # Time INSIDE the lock (render only, not lock-wait — waiting
            # would inflate mean_render_s under concurrency) and mutate
            # the counters under it too: handler threads come from
            # ThreadingHTTPServer and += is not atomic under the GIL.
            t0 = time.perf_counter()
            # rgb requests: uint8 on device + no depth fetch (the 4-16x
            # smaller payload is the dominant residual transfer term on
            # tunneled backends; to_uint8 below is idempotent).
            out = self.trainer.render_image(
                pose, height, width, focal, chunk=chunk,
                quant=self.use_quant, sampler=self.use_sampler,
                uint8_rgb=(map_name == "rgb"),
                need_depth=(map_name == "depth"),
            )
            self.total_render_s += time.perf_counter() - t0
            self.requests += 1
        img = (
            to_uint8(out["rgb"]) if map_name == "rgb"
            else to_uint8(normalize_depth(out["depth"]))
        )
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        return buf.getvalue()

    def stats(self) -> dict:
        return {
            "checkpoint": self.checkpoint,
            "requests": self.requests,
            "mean_render_s": (
                self.total_render_s / self.requests if self.requests else 0.0
            ),
            "quant": "int8" if self.use_quant else "none",
            "sampler": self.use_sampler,
            "reloads": self.reloads,
        }


def _make_handler(service: RenderService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            if url.path == "/healthz":
                self._send(200, b"ok", "text/plain")
                return
            if url.path == "/stats":
                self._send(
                    200, json.dumps(service.stats()).encode(),
                    "application/json",
                )
                return
            if url.path == "/render":
                q = parse_qs(url.query)

                def f(name, default):
                    return float(q.get(name, [default])[0])

                try:
                    png = service.render_png(
                        theta=f("theta", 0.0),
                        phi=f("phi", -30.0),
                        radius=f("radius", 4.0),
                        height=int(f("height", service.cfg.height)),
                        width=int(f("width", service.cfg.width)),
                        chunk=int(f("chunk", 16384)),
                        focal=float(q["focal"][0]) if "focal" in q else None,
                        map_name=q.get("map", ["rgb"])[0],
                    )
                except Exception as e:  # surface render errors as 500s
                    self._send(500, str(e).encode(), "text/plain")
                    return
                self._send(200, png, "image/png")
                return
            self._send(404, b"not found", "text/plain")

        def do_POST(self):  # noqa: N802 (http.server API)
            if urlparse(self.path).path == "/reload":
                try:
                    result = service.reload()
                except Exception as e:  # surface reload errors as 500s
                    self._send(500, str(e).encode(), "text/plain")
                    return
                self._send(
                    200, json.dumps(result).encode(), "application/json"
                )
                return
            self._send(404, b"not found", "text/plain")

    return Handler


def serve(service: RenderService, port: int, host: str = "127.0.0.1"):
    """Build the HTTP server (caller runs serve_forever / shutdown)."""
    return ThreadingHTTPServer((host, port), _make_handler(service))


def main(argv=None) -> None:
    import jax

    from nerf_keras_tpu.config import load_config

    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--near", type=float, default=None,
                   help="near bound (default: checkpoint sidecar, else 2.0)")
    p.add_argument("--far", type=float, default=None,
                   help="far bound (default: checkpoint sidecar, else 6.0)")
    p.add_argument("--port", type=int, default=8042)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--quant", type=str, default="none",
                   choices=("none", "int8"),
                   help="int8: serve through the calibrated int8 MXU "
                        "kernel (PSNR-gated against the float render at "
                        "startup)")
    p.add_argument("--quant-gate-db", type=float, default=30.0)
    p.add_argument("--sampler", type=str, default="coarse",
                   choices=("coarse", "proposal"),
                   help="proposal: serve with the distilled proposal "
                        "sampler (skips the coarse MLP pass; PSNR-gated "
                        "against the coarse-sampled render at startup)")
    p.add_argument("--sampler-gate-db", type=float, default=30.0)
    p.add_argument("--proposal-steps", type=int, default=1500)
    p.add_argument("--infer-cache", type=str, default=None,
                   help="path to an .infer.npz artifact cache: int8 "
                        "tables and the distilled proposal net are "
                        "reloaded from it when it matches the checkpoint "
                        "weights (sha256-gated), else rebuilt and saved "
                        "there — a restart skips the ~20 s rebuild")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from nerf_keras_tpu.utils.cache import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()

    service = RenderService(
        load_config(args.config), args.checkpoint, args.near, args.far,
        quant=args.quant == "int8", quant_gate_db=args.quant_gate_db,
        sampler=args.sampler, sampler_gate_db=args.sampler_gate_db,
        proposal_steps=args.proposal_steps, infer_cache=args.infer_cache,
    )
    server = serve(service, args.port, args.host)
    print(f"[nerf-tpu] serving {service.checkpoint} on "
          f"http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
