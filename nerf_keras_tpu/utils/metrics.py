"""Metric tracking and training history.

Counterpart of the reference's keras.metrics.Mean trackers
(models.py:84-86) and its per-epoch history JSON
(train_lego.py:161-181, :243-264) — same key names so downstream tooling
can consume either."""

from __future__ import annotations

import json

from nerf_keras_tpu.utils import io


class History:
    """Per-epoch metric history with the reference's JSON schema
    (keys ``losses_coarse`` / ``losses`` / ``psnrs``, train_lego.py:179-181)."""

    def __init__(self) -> None:
        self.losses_coarse: list[float] = []
        self.losses: list[float] = []
        self.psnrs: list[float] = []
        self.val: dict[str, list[float]] = {"losses": [], "psnrs": [], "ssims": []}

    def append(self, metrics: dict, val_metrics: dict | None = None) -> None:
        self.losses_coarse.append(float(metrics["loss_coarse"]))
        self.losses.append(float(metrics["loss"]))
        self.psnrs.append(float(metrics["psnr"]))
        if val_metrics is not None:
            self.val["losses"].append(float(val_metrics["loss"]))
            self.val["psnrs"].append(float(val_metrics["psnr"]))
            if "ssim" in val_metrics:
                self.val["ssims"].append(float(val_metrics["ssim"]))

    def to_dict(self) -> dict:
        out = {
            "losses_coarse": self.losses_coarse,
            "losses": self.losses,
            "psnrs": self.psnrs,
        }
        if self.val["losses"]:
            out["val_losses"] = self.val["losses"]
            out["val_psnrs"] = self.val["psnrs"]
        if self.val["ssims"]:
            # beyond-reference key (reference history has loss/psnr only)
            out["val_ssims"] = self.val["ssims"]
        return out

    def save(self, path: str) -> None:
        with io.open_file(path, "w") as f:
            json.dump(self.to_dict(), f)

    @classmethod
    def load(cls, path: str) -> "History":
        """Rebuild from a saved history JSON (resume continues the record
        instead of overwriting the pre-resume epochs)."""
        with io.open_file(path, "r") as f:
            raw = json.load(f)
        h = cls()
        h.losses_coarse = list(raw.get("losses_coarse", []))
        h.losses = list(raw.get("losses", []))
        h.psnrs = list(raw.get("psnrs", []))
        h.val["losses"] = list(raw.get("val_losses", []))
        h.val["psnrs"] = list(raw.get("val_psnrs", []))
        h.val["ssims"] = list(raw.get("val_ssims", []))
        return h
