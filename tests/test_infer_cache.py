"""Inference-artifact cache: pytree round-trip, digest gating, wiring.

utils/infer_cache.py persists the weight-derived inference state (int8
tables, distilled proposal net) keyed by a sha256 of the weights — the
cross-process twin of Trainer._invalidate_derived.  Runs on the virtual
8-device CPU mesh (trainer cases exercise the sharded render path).
"""
from __future__ import annotations

import numpy as np
import pytest

from nerf_keras_tpu.utils.infer_cache import (
    StaleArtifactsError,
    _unflatten,
    load_artifacts,
    params_digest,
    save_artifacts,
)


def test_unflatten_rebuilds_nested_dicts_and_lists():
    flat = {
        "['layers'][1]['w']": np.ones((2, 2)),
        "['layers'][0]['w']": np.zeros((2, 2)),
        "['layers'][0]['b']": np.zeros((2,)),
        "['layers'][1]['b']": np.ones((2,)),
        "['inv_x']": np.full((1, 3), 2.0),
    }
    tree = _unflatten(flat)
    assert isinstance(tree["layers"], list) and len(tree["layers"]) == 2
    assert tree["layers"][1]["w"][0, 0] == 1.0
    assert tree["inv_x"].shape == (1, 3)
    with pytest.raises(ValueError, match="non-dense"):
        _unflatten({"['a'][0]['w']": np.zeros(1), "['a'][2]['w']": np.zeros(1)})


def test_digest_sensitive_to_values_paths_and_extra():
    t1 = {"a": np.zeros((2, 2), np.float32), "b": np.ones(3, np.float32)}
    t2 = {"a": np.zeros((2, 2), np.float32), "b": np.ones(3, np.float32)}
    assert params_digest(t1) == params_digest(t2)
    t2["b"] = np.array([1, 1, 2], np.float32)
    assert params_digest(t1) != params_digest(t2)
    assert params_digest(t1) != params_digest({"c": t1["a"], "b": t1["b"]})
    assert params_digest(t1) != params_digest(t1, extra={"skip_layer": 4})


def test_save_load_roundtrip_and_digest_gate(tmp_path):
    p = str(tmp_path / "art.infer.npz")
    pparams = {"layers": [{"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                           "b": np.zeros(3, np.float32)}]}
    qparams = {"trunk": [{"wq": np.ones((2, 2), np.int8),
                          "scale": np.ones((1, 2), np.float32)}],
               "inv_x": np.full((1, 2), 3.0, np.float32)}
    save_artifacts(p, "d1", pparams=pparams, prop_l_xyz=4,
                   distill_loss=0.25, qparams=qparams)
    art = load_artifacts(p, "d1")
    assert art["prop_l_xyz"] == 4 and art["distill_loss"] == 0.25
    np.testing.assert_array_equal(
        art["pparams"]["layers"][0]["w"], pparams["layers"][0]["w"]
    )
    assert art["qparams"]["trunk"][0]["wq"].dtype == np.int8
    with pytest.raises(StaleArtifactsError, match="different weights"):
        load_artifacts(p, "d2")
    with pytest.raises(ValueError, match="nothing to save"):
        save_artifacts(str(tmp_path / "e.npz"), "d1")


def _tiny_trainer(**over):
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer

    kw = dict(
        batch_size=64, ns_coarse=8, ns_fine=8, height=8, width=8,
        l_xyz=4, l_dir=2, num_layers=4, hidden_dim=32, skip_layer=4,
        compute_dtype="float32",
    )
    kw.update(over)
    cfg = NeRFConfig(**kw)
    return Trainer(cfg, 2.0, 6.0), cfg


def test_trainer_artifact_cache_roundtrip(tmp_path):
    """A second trainer on the same checkpoint reloads the artifacts and
    renders EXACTLY what the builder rendered — and a weight change makes
    the cache refuse to load."""
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.ops.rays import pose_spherical
    from nerf_keras_tpu.utils.checkpoint import save_checkpoint

    trainer, cfg = _tiny_trainer()
    pose = pose_spherical(30.0, -30.0, 4.0)
    o, d = trainer.pose_rays(pose, cfg.height, cfg.width, 10.0)
    ckpt = str(tmp_path / "model.ckpt.npz")
    save_checkpoint(ckpt, trainer.state, cfg)

    with pytest.raises(RuntimeError, match="nothing to save"):
        trainer.save_inference_artifacts(str(tmp_path / "none.npz"))

    trainer.build_proposal_sampler(o, d, steps=10, batch=64)
    trainer.quantize_for_inference(o, d)
    art = str(tmp_path / "model.infer.npz")
    trainer.save_inference_artifacts(art)
    ref = trainer.render_rays(o, d, chunk=64, sampler="proposal",
                              quant=True)

    fresh = Trainer(cfg, 2.0, 6.0).restore(ckpt)
    assert not fresh.quant_ready and not fresh.proposal_ready
    fresh.load_inference_artifacts(art)
    assert fresh.quant_ready and fresh.proposal_ready
    out = fresh.render_rays(o, d, chunk=64, sampler="proposal", quant=True)
    np.testing.assert_array_equal(out["rgb_fine"], ref["rgb_fine"])

    # New weights -> the digest diverges and the cache refuses.
    batch = fresh.put_batch((
        np.zeros((cfg.batch_size, 3), np.float32),
        np.tile(np.float32([0, 0, 4.0]), (cfg.batch_size, 1)),
        np.tile(np.float32([0, 0, -1.0]), (cfg.batch_size, 1)),
    ))
    fresh.train_step(batch)
    with pytest.raises(StaleArtifactsError, match="different weights"):
        fresh.load_inference_artifacts(art)


def test_serving_uses_artifact_cache(tmp_path, capsys):
    """RenderService round trip: first start builds + saves, a restart
    loads instead of re-distilling (proposal steps would differ)."""
    from nerf_keras_tpu.serving import RenderService
    from nerf_keras_tpu.utils.checkpoint import save_checkpoint

    trainer, cfg = _tiny_trainer()
    ckpt = str(tmp_path / "model.ckpt.npz")
    save_checkpoint(ckpt, trainer.state, cfg,
                    scene={"near": 2.0, "far": 6.0, "focal": 10.0})
    art = str(tmp_path / "model.infer.npz")

    svc = RenderService(cfg, ckpt, sampler="proposal", sampler_gate_db=0.0,
                        proposal_steps=10, infer_cache=art)
    assert svc.trainer.proposal_ready
    out = capsys.readouterr().out
    assert "saved inference artifacts" in out
    first = np.load(art)["__digest__"].item()

    svc2 = RenderService(cfg, ckpt, sampler="proposal", sampler_gate_db=0.0,
                         proposal_steps=10, infer_cache=art)
    out = capsys.readouterr().out
    assert "loaded inference artifacts" in out
    assert "saved inference artifacts" not in out
    assert svc2.trainer.proposal_ready
    assert np.load(art)["__digest__"].item() == first
