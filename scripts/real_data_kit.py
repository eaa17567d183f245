#!/usr/bin/env python
"""Real-data readiness kit: one command from closing the two
environment-blocked gaps (round-4 VERDICT #6).

The two residuals on the record since round 1 are (a) PSNR parity on the
ACTUAL Lego/Fern captures (reference lego_data_utils.py:11-14 downloads
``tiny_nerf_data.npz``; fern_data_utils.py:369-460 trains the Fern LLFF
capture) and (b) a live ``gs://`` execution of utils/io.py — both blocked
by zero egress, not by missing code.  This script is the closure plan as
an executable: the day egress (or a mounted copy of the data, or GCS
credentials) exists, run

    python scripts/real_data_kit.py --all [--gcs-prefix gs://bucket/tmp]

and it downloads + checksums the captures, runs the parity harness
(scripts/parity_vs_reference.py — the REAL reference code as the control
arm) on real Lego, smoke-trains the Fern capture through data/llff.py,
round-trips utils/io.py against the real bucket, and writes
``docs/evidence/real_lego_parity.json`` / ``real_data_readiness.json``.

``--dry-run`` proves the script itself is known-good TODAY with zero
egress: every stage runs against local fixtures (synthesized npz, a
fabricated LLFF capture, ``memory://`` for the bucket) through the SAME
code paths; only the fetch sources differ.  tests/test_data.py::
test_real_data_kit_dry_run pins that.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Reference download source (lego_data_utils.py:11-14).
TINY_NERF_URL = ("http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/"
                 "ECCV20/nerf/tiny_nerf_data.npz")
# Official NeRF LLFF release (the Fern capture the reference trains;
# fern_data_utils.py loads its poses_bounds.npy + images layout).
LLFF_DATA_URL = ("https://people.eecs.berkeley.edu/~bmild/nerf/"
                 "nerf_llff_data.zip")


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch_lego(dest_dir: str, dry_run: bool) -> dict:
    """Stage 1a: obtain tiny_nerf_data.npz (download, or synthesize the
    procedural stand-in under --dry-run) and validate its structure."""
    import numpy as np

    os.makedirs(dest_dir, exist_ok=True)
    npz_path = os.path.join(dest_dir, "tiny_nerf_data.npz")
    if dry_run:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from parity_vs_reference import make_scene_npz

        make_scene_npz(npz_path, 8, 25, 25)
        source = "dry-run synthetic stand-in"
    elif not os.path.exists(npz_path):
        import urllib.request

        print(f"[kit] downloading {TINY_NERF_URL}", flush=True)
        tmp = npz_path + ".part"
        urllib.request.urlretrieve(TINY_NERF_URL, tmp)
        os.replace(tmp, npz_path)
        source = TINY_NERF_URL
    else:
        source = "already present"

    # Structural checksum: the real capture must load through OUR loader
    # contract (images/poses/focal keys, (N,H,W,3)x(N,4,4) shapes).
    with np.load(npz_path) as d:
        images, poses = d["images"], d["poses"]
        focal = float(d["focal"])
    assert images.ndim == 4 and images.shape[-1] == 3, images.shape
    assert poses.shape == (images.shape[0], 4, 4), poses.shape
    assert focal > 0
    return {
        "path": npz_path, "source": source, "sha256": sha256(npz_path),
        "images": list(images.shape), "focal": focal,
    }


def fetch_fern(dest_dir: str, dry_run: bool) -> dict:
    """Stage 1b: obtain the Fern LLFF capture (download+unzip, or
    fabricate a tiny valid capture under --dry-run)."""
    import numpy as np

    fern_dir = os.path.join(dest_dir, "fern")
    if dry_run:
        from PIL import Image

        img_dir = os.path.join(fern_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        rng = np.random.default_rng(11)
        n, h, w = 4, 12, 16
        for i in range(n):
            arr = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(img_dir, f"img_{i:02d}.png"))
        poses = np.zeros((n, 3, 5))
        for i in range(n):
            poses[i, :, 0] = [0, -1, 0]
            poses[i, :, 1] = [1, 0, 0]
            poses[i, :, 2] = [0, 0, 1]
            poses[i, :, 3] = [0.1 * i, 0.05 * i, 4.0 + 0.1 * i]
            poses[i, :, 4] = [h, w, 20.0]
        bds = np.stack([np.full(n, 2.0), np.full(n, 6.0)], axis=1)
        np.save(os.path.join(fern_dir, "poses_bounds.npy"),
                np.concatenate([poses.reshape(n, -1), bds], axis=1))
        source = "dry-run fabricated capture"
    elif not os.path.isdir(fern_dir):
        import urllib.request
        import zipfile

        zip_path = os.path.join(dest_dir, "nerf_llff_data.zip")
        if not os.path.exists(zip_path):
            print(f"[kit] downloading {LLFF_DATA_URL}", flush=True)
            urllib.request.urlretrieve(LLFF_DATA_URL, zip_path + ".part")
            os.replace(zip_path + ".part", zip_path)
        with zipfile.ZipFile(zip_path) as z:
            members = [m for m in z.namelist()
                       if "/fern/" in m or m.endswith("/fern")]
            z.extractall(dest_dir, members=members or None)
        # the archive nests under nerf_llff_data/
        nested = os.path.join(dest_dir, "nerf_llff_data", "fern")
        if os.path.isdir(nested) and not os.path.isdir(fern_dir):
            os.rename(nested, fern_dir)
        source = LLFF_DATA_URL
    else:
        source = "already present"

    pb = os.path.join(fern_dir, "poses_bounds.npy")
    assert os.path.exists(pb), f"missing {pb}"
    arr = np.load(pb)
    assert arr.ndim == 2 and arr.shape[1] == 17, arr.shape
    return {"path": fern_dir, "source": source,
            "poses_bounds_sha256": sha256(pb), "n_images": int(arr.shape[0])}


def run_lego_parity(npz_path: str, out_dir: str, epochs: int,
                    dry_run: bool) -> dict:
    """Stage 2: the parity harness (REAL reference code as control) on the
    real — or stand-in — capture.  Subprocess: the harness pins CPU and
    imports TF/keras, neither of which belongs in this interpreter."""
    report_name = ("real_lego_parity_dryrun.json" if dry_run
                   else "real_lego_parity.json")
    cmd = [sys.executable,
           os.path.join(REPO, "scripts", "parity_vs_reference.py"),
           "--npz", npz_path, "--epochs", str(epochs),
           "--out", out_dir, "--report-name", report_name]
    print(f"[kit] parity: {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)
    with open(os.path.join(out_dir, report_name)) as f:
        rep = json.load(f)
    return {
        "report": os.path.join(out_dir, report_name),
        "ours_final_val_psnr": rep["ours_history"]["val_psnr"][-1],
        "reference_final_val_psnr": rep["reference_history"]["val_psnr"][-1],
    }


def run_fern_smoke(fern_dir: str, epochs: int,
                   config_path: str | None = None) -> dict:
    """Stage 3: the Fern capture through data/llff.py + a short training
    run (the reference's train_fern.py flow, reduced)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nerf_keras_tpu.config import load_config
    from nerf_keras_tpu.data.llff import prepare_fern_data
    from nerf_keras_tpu.data.pipeline import iterate_batches
    from nerf_keras_tpu.engine.trainer import Trainer

    cfg = load_config(config_path or
                      os.path.join(REPO, "config", "fern_batch_debug.json"))
    train_ds, val_ds, (near, far), focal = prepare_fern_data(
        cfg.height, cfg.width, basedir=fern_dir, factor=1,
    )
    trainer = Trainer(cfg, near, far)
    hist = []
    for epoch in range(epochs):
        m = trainer.train_epoch(iterate_batches(
            train_ds, cfg.batch_size, shuffle=True, seed=cfg.seed,
            epoch=epoch))
        hist.append(float(m["psnr"]))
    v = trainer.evaluate(iterate_batches(
        val_ds, min(cfg.batch_size, len(val_ds)), shuffle=False))
    return {"train_psnrs": hist, "val_psnr": float(v["psnr"]),
            "near": float(near), "far": float(far), "focal": float(focal)}


def run_gcs_roundtrip(prefix: str) -> dict:
    """Stage 4: utils/io.py against a real (or memory://) bucket prefix:
    makedirs, write, exists, listdir, read-back — the exact call set the
    training loop uses for gs:// run dirs."""
    from nerf_keras_tpu.utils import io

    stamp = str(int(time.time()))
    base = io.join(prefix, f"readiness_{stamp}")
    payload = os.urandom(1 << 16)
    io.makedirs(base)
    path = io.join(base, "roundtrip.bin")
    with io.open_file(path, "wb") as f:
        f.write(payload)
    assert io.exists(path), path
    names = io.listdir(base)
    assert "roundtrip.bin" in names, names
    with io.open_file(path, "rb") as f:
        back = f.read()
    assert back == payload, "payload mismatch on read-back"
    return {"prefix": prefix, "path": path, "bytes": len(payload),
            "ok": True}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dest", default="/tmp/real_data",
                   help="download/scratch directory")
    p.add_argument("--out", default=os.path.join(REPO, "docs", "evidence"))
    p.add_argument("--epochs", type=int, default=12,
                   help="parity/smoke training epochs")
    p.add_argument("--gcs-prefix", default="memory://readiness",
                   help="real gs://bucket/path closes gap (b); the "
                        "memory:// default exercises the same fsspec "
                        "branches without credentials")
    p.add_argument("--dry-run", action="store_true",
                   help="run every stage against local fixtures (no "
                        "egress) to prove the kit itself works")
    p.add_argument("--all", action="store_true",
                   help="run all stages (default if no stage flag given)")
    p.add_argument("--skip-parity", action="store_true",
                   help="skip the (slow) reference-control parity stage")
    p.add_argument("--fern-config", default=None,
                   help="config JSON for the fern smoke stage (default "
                        "config/fern_batch_debug.json; the pinning test "
                        "passes a tiny model so the stage exercises the "
                        "pipeline, not an 8x256 CPU compile)")
    args = p.parse_args()

    # Pin CPU BEFORE any backend use: this is a data/IO tool, and the
    # synthetic-npz stage runs jnp code — without the pin a sitecustomize
    # that registers the axon TPU plugin lands those trivial ops on the
    # shared tunneled chip, where they serialize behind real jobs for
    # minutes (the CLAUDE.md intended-CPU-run trap; cost this kit's test
    # a 4-7 min wall time until diagnosed).
    import jax

    jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out, exist_ok=True)
    report: dict = {
        "what": ("real-data readiness record: the two env-blocked gaps "
                 "(real-capture parity, live gs://) executed end to end; "
                 "dry_run=True means local fixtures stood in for the "
                 "unreachable sources — same code paths, different "
                 "bytes"),
        "dry_run": bool(args.dry_run),
        "when": time.strftime("%Y-%m-%d %H:%M:%S"),
        "stages": {},
    }
    try:
        report["stages"]["fetch_lego"] = fetch_lego(args.dest, args.dry_run)
        report["stages"]["fetch_fern"] = fetch_fern(args.dest, args.dry_run)
        if not args.skip_parity:
            report["stages"]["lego_parity"] = run_lego_parity(
                report["stages"]["fetch_lego"]["path"], args.out,
                args.epochs, args.dry_run,
            )
        report["stages"]["fern_smoke"] = run_fern_smoke(
            report["stages"]["fetch_fern"]["path"],
            max(2, args.epochs // 4), config_path=args.fern_config,
        )
        report["stages"]["gcs_roundtrip"] = run_gcs_roundtrip(
            args.gcs_prefix)
    finally:
        name = ("real_data_readiness_dryrun.json" if args.dry_run
                else "real_data_readiness.json")
        out_path = os.path.join(args.out, name)
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"[kit] report at {out_path}", flush=True)
    done = ", ".join(report["stages"])
    print(f"[kit] stages ok: {done}", flush=True)


if __name__ == "__main__":
    main()
