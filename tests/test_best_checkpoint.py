"""Best-val checkpoint retention, collapse guard, and schedule pinning.

Round-3 VERDICT item: three documented late-decay failure modes
(long-horizon inversion, auto-stretched-schedule seed lottery, union-free
late decay) overwrite a run's peak weights when only the latest
checkpoint is kept.  The loop now retains ``best.*.ckpt.npz`` on every
improving eval, warns loudly on a >=2 dB decay from peak, and pins
auto-resolved schedule horizons at the validated ~80-epoch count.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

import train_synthetic
from nerf_keras_tpu.utils.checkpoint import (
    best_checkpoint,
    latest_checkpoint,
    resolve_checkpoint,
)


def _cfg(tmp_path, **extra):
    raw = {
        "BATCH_SIZE": 128, "NS_COARSE": 4, "NS_FINE": 8,
        "HEIGHT": 12, "WIDTH": 12, "L_XYZ": 4, "L_DIR": 2,
        "NUM_LAYERS": 2, "HIDDEN_DIM": 16, "SKIP_LAYER": 4, "EPOCHS": 3,
        "LEARNING_RATE": 0.002, "BATCH_NORM": False, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32", "EVAL_EVERY": 1,
    }
    raw.update(extra)
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(raw))
    return str(p)


def test_checkpoint_resolution_order(tmp_path):
    """best.* wins resolve_checkpoint; latest_checkpoint never returns it."""
    assert resolve_checkpoint(str(tmp_path)) is None
    (tmp_path / "nerf_l2_d16_n12_ep3.ckpt.npz").write_bytes(b"x")
    assert latest_checkpoint(str(tmp_path)).endswith(
        "nerf_l2_d16_n12_ep3.ckpt.npz"
    )
    assert resolve_checkpoint(str(tmp_path)).endswith(
        "nerf_l2_d16_n12_ep3.ckpt.npz"
    )
    (tmp_path / "best.nerf_l2_d16_n12_ep3.ckpt.npz").write_bytes(b"x")
    assert best_checkpoint(str(tmp_path)).endswith(
        "best.nerf_l2_d16_n12_ep3.ckpt.npz"
    )
    assert resolve_checkpoint(str(tmp_path)).endswith(
        "best.nerf_l2_d16_n12_ep3.ckpt.npz"
    )
    # latest still points at the true latest, not the retention copy
    assert latest_checkpoint(str(tmp_path)).endswith(
        "/nerf_l2_d16_n12_ep3.ckpt.npz"
    )


def test_best_retention_survives_decay(tmp_path, monkeypatch, capsys):
    """A scripted val collapse: the best.* checkpoint keeps the peak
    state while the latest checkpoint moves on, and the collapse warning
    fires."""
    from nerf_keras_tpu.cli.train import run_training
    from nerf_keras_tpu.engine.trainer import Trainer

    scripted = iter([20.0, 25.0, 12.0])  # peak at epoch 2, collapse at 3

    def fake_evaluate(self, batches):
        for _ in batches:
            pass
        return {"loss": 0.01, "loss_coarse": 0.01, "psnr": next(scripted)}

    monkeypatch.setattr(Trainer, "evaluate", fake_evaluate)
    run_dir = tmp_path / "run"
    run_training(
        train_synthetic.prepare, _cfg(tmp_path), default_eval_every=1,
        argv=["--config", _cfg(tmp_path), "--run-dir", str(run_dir),
              "--platform", "cpu"],
    )
    out = capsys.readouterr().out
    assert "WARNING: val PSNR 12.00 is 13.00 dB below" in out
    assert "best val PSNR 25.00 retained" in out

    best = best_checkpoint(str(run_dir))
    latest = latest_checkpoint(str(run_dir))
    assert best is not None and latest is not None and best != latest
    # the retained state is the epoch-2 peak (2 epochs * 7 steps), the
    # latest is epoch 3's
    step_best = int(np.load(best)[".step"])
    step_latest = int(np.load(latest)[".step"])
    assert step_best < step_latest
    assert resolve_checkpoint(str(run_dir)) == best


def test_best_seeded_from_resumed_history(tmp_path, monkeypatch, capsys):
    """Resume must not treat its first eval as a fresh record: a lower
    post-resume eval neither overwrites best.* nor resets the peak."""
    from nerf_keras_tpu.cli.train import run_training
    from nerf_keras_tpu.engine.trainer import Trainer

    seq = {"vals": iter([30.0, 30.5, 31.0])}

    def fake_evaluate(self, batches):
        for _ in batches:
            pass
        return {"loss": 0.01, "loss_coarse": 0.01, "psnr": next(seq["vals"])}

    monkeypatch.setattr(Trainer, "evaluate", fake_evaluate)
    run_dir = tmp_path / "run"
    cfg = _cfg(tmp_path)
    run_training(
        train_synthetic.prepare, cfg, default_eval_every=1,
        argv=["--config", cfg, "--run-dir", str(run_dir),
              "--platform", "cpu"],
    )
    best = best_checkpoint(str(run_dir))
    step_peak = int(np.load(best)[".step"])

    seq["vals"] = iter([14.0, 15.0])  # worse than the recorded 31.0 peak
    run_training(
        train_synthetic.prepare, cfg, default_eval_every=1,
        argv=["--config", cfg, "--run-dir", str(run_dir),
              "--resume", latest_checkpoint(str(run_dir)),
              "--epochs", "5", "--platform", "cpu"],
    )
    out = capsys.readouterr().out
    assert "WARNING: val PSNR 14.00 is 17.00 dB below" in out
    assert int(np.load(best_checkpoint(str(run_dir)))[".step"]) == step_peak


def test_schedule_pinning(tmp_path, monkeypatch):
    """Auto horizons cap at the validated epoch count; the flag opts out;
    explicit horizons win."""
    from nerf_keras_tpu.cli import train as train_cli

    monkeypatch.setattr(train_cli, "VALIDATED_HORIZON_EPOCHS", 2)
    cfg = _cfg(tmp_path, EPOCHS=3, LR_FINAL=5e-5, EVAL_EVERY=3)
    # 12x12, 12 views, 80% train -> 1382 rays -> 10 steps/epoch at b=128
    tr = train_cli.run_training(
        train_synthetic.prepare, cfg, default_eval_every=3,
        argv=["--config", cfg, "--run-dir", str(tmp_path / "a"),
              "--platform", "cpu"],
    )
    steps_per_epoch = 10
    assert tr.cfg.lr_decay_steps == 2 * steps_per_epoch

    tr = train_cli.run_training(
        train_synthetic.prepare, cfg, default_eval_every=3,
        argv=["--config", cfg, "--run-dir", str(tmp_path / "b"),
              "--platform", "cpu", "--no-pin-schedules"],
    )
    assert tr.cfg.lr_decay_steps == 3 * steps_per_epoch

    cfg_exp = _cfg(tmp_path, EPOCHS=3, LR_FINAL=5e-5, EVAL_EVERY=3,
                   LR_DECAY_STEPS=11)
    tr = train_cli.run_training(
        train_synthetic.prepare, cfg_exp, default_eval_every=3,
        argv=["--config", cfg_exp, "--run-dir", str(tmp_path / "c"),
              "--platform", "cpu"],
    )
    assert tr.cfg.lr_decay_steps == 11
