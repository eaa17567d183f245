"""Held-out-view evaluation CLI (cli/evaluate.py, beyond-reference).

The reference has no post-hoc checkpoint scoring at all; these pin the
eval protocol end to end on the synthetic scene: per-view PSNR/SSIM,
split means, JSON artifact, image dumps, and the accelerated-path knobs.
"""

import json
import os

import jax
import numpy as np
import pytest

from nerf_keras_tpu.cli.evaluate import evaluate_views, run_evaluation
from nerf_keras_tpu.config import load_config
from nerf_keras_tpu.engine.step import init_train_state
from nerf_keras_tpu.utils.checkpoint import save_checkpoint


def _write_config(tmp_path, h=16, w=16, **extra):
    cfg = {
        "BATCH_SIZE": 64, "NS_COARSE": 4, "NS_FINE": 4,
        "HEIGHT": h, "WIDTH": w, "L_XYZ": 2, "L_DIR": 1,
        "NUM_LAYERS": 2, "HIDDEN_DIM": 16, "SKIP_LAYER": 4,
        "EPOCHS": 1, "LEARNING_RATE": 0.0005, "BATCH_NORM": False,
        "WITH_GCS": False, "COMPUTE_DTYPE": "float32",
    }
    cfg.update(extra)
    path = tmp_path / "tiny.json"
    path.write_text(json.dumps(cfg))
    return str(path)


def _make_ckpt(tmp_path, cfg_path):
    cfg = load_config(cfg_path)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    ckpt = str(tmp_path / "tiny.ckpt.npz")
    save_checkpoint(ckpt, state, cfg,
                    scene={"near": 2.0, "far": 6.0, "focal": 19.2})
    return ckpt


def test_eval_json_and_images(tmp_path):
    cfg_path = _write_config(tmp_path)
    ckpt = _make_ckpt(tmp_path, cfg_path)
    out = str(tmp_path / "eval.json")
    img_dir = str(tmp_path / "imgs")

    report = run_evaluation([
        "--config", cfg_path, "--checkpoint", ckpt,
        "--data", "synthetic", "--split", "val",
        "--chunk", "128", "--out", out, "--save-images", img_dir,
    ])
    # synthetic: 12 views, 80/20 split -> 3 val views (16x16 fits SSIM's
    # 11x11 window).
    assert len(report["views"]) == 3
    for row in report["views"]:
        assert np.isfinite(row["psnr"])
        assert -1.0 <= row["ssim"] <= 1.0
    assert set(report["mean"]) == {"mse", "psnr", "ssim"}
    disk = json.load(open(out))
    assert disk["mean"] == report["mean"]
    assert disk["split"] == "val"
    pngs = sorted(os.listdir(img_dir))
    assert pngs == [
        "val_000_gt.png", "val_000_pred.png",
        "val_001_gt.png", "val_001_pred.png",
        "val_002_gt.png", "val_002_pred.png",
    ]


def test_eval_ssim_skipped_below_window(tmp_path):
    cfg_path = _write_config(tmp_path, h=10, w=10)
    ckpt = _make_ckpt(tmp_path, cfg_path)
    report = run_evaluation([
        "--config", cfg_path, "--checkpoint", ckpt,
        "--data", "synthetic", "--chunk", "128",
        "--out", str(tmp_path / "e.json"),
    ])
    assert "ssim" not in report["views"][0]
    assert set(report["mean"]) == {"mse", "psnr"}


def test_eval_scene_selects_synthetic_variant(tmp_path):
    """--scene spheres must score against the multi-object ground truth:
    the same checkpoint gets DIFFERENT per-view targets, so mse differs
    from the single-sphere default (the silent-mismatch bug class)."""
    cfg_path = _write_config(tmp_path)
    ckpt = _make_ckpt(tmp_path, cfg_path)
    base = [
        "--config", cfg_path, "--checkpoint", ckpt,
        "--data", "synthetic", "--chunk", "128",
        "--out", str(tmp_path / "e.json"),
    ]
    rep_sphere = run_evaluation(base)
    rep_multi = run_evaluation(base + ["--scene", "spheres"])
    assert rep_sphere["mean"]["mse"] != rep_multi["mean"]["mse"]


def test_eval_train_split_and_default_out(tmp_path):
    cfg_path = _write_config(tmp_path, h=12, w=12)
    ckpt = _make_ckpt(tmp_path, cfg_path)
    report = run_evaluation([
        "--config", cfg_path, "--checkpoint", ckpt,
        "--data", "synthetic", "--split", "train", "--chunk", "128",
    ])
    assert len(report["views"]) == 9  # 80% of 12 views
    assert os.path.exists(str(tmp_path / "eval_train.json"))


def test_eval_trained_model_beats_random(tmp_path):
    """A briefly-trained checkpoint must outscore random init — the
    metric actually measures the model."""
    from nerf_keras_tpu.cli.train import run_training
    from nerf_keras_tpu.data.synthetic import prepare_synthetic_data

    cfg_path = _write_config(
        tmp_path, h=16, w=16, EPOCHS=3, LEARNING_RATE=0.002,
        NS_COARSE=8, NS_FINE=8, NUM_LAYERS=3, HIDDEN_DIM=32,
    )
    run_dir = str(tmp_path / "run")
    run_training(
        lambda h, w, data_dir=None: prepare_synthetic_data(h, w),
        cfg_path, default_eval_every=5,
        argv=["--config", cfg_path, "--run-dir", run_dir],
    )
    trained = run_evaluation([
        "--config", cfg_path, "--checkpoint", run_dir,
        "--data", "synthetic", "--chunk", "256",
        "--out", str(tmp_path / "trained.json"),
    ])
    random = run_evaluation([
        "--config", cfg_path, "--checkpoint", _make_ckpt(tmp_path, cfg_path),
        "--data", "synthetic", "--chunk", "256",
        "--out", str(tmp_path / "random.json"),
    ])
    assert trained["mean"]["psnr"] > random["mean"]["psnr"] + 1.0
    assert trained["mean"]["ssim"] > random["mean"]["ssim"]


def test_eval_quant_and_proposal_paths(tmp_path):
    """--quant int8 / --sampler proposal run ungated and report their own
    quality; the report rows keep the same schema."""
    cfg_path = _write_config(tmp_path, h=16, w=16)
    ckpt = _make_ckpt(tmp_path, cfg_path)
    report = run_evaluation([
        "--config", cfg_path, "--checkpoint", ckpt,
        "--data", "synthetic", "--chunk", "128",
        "--quant", "int8", "--sampler", "proposal",
        "--proposal-steps", "5",
        "--out", str(tmp_path / "q.json"),
    ])
    assert report["quant"] == "int8"
    assert report["sampler"] == "proposal"
    assert np.isfinite(report["mean"]["psnr"])


def test_eval_blender_test_split(tmp_path):
    """--data blender scores an on-disk nerf_synthetic scene; --split test
    loads the full transforms_test.json (the paper-table split) and the
    config's WHITE_BKGD drives the loader's compositing."""
    from tests.test_data import _write_blender_scene

    scene = tmp_path / "scene"
    _write_blender_scene(scene, n_train=2, n_val=2, h=16, w=16)
    # a 3-frame test split, distinct from val
    import shutil
    (scene / "test").mkdir()
    for i in range(3):
        shutil.copy(scene / "val" / "r_0.png", scene / "test" / f"r_{i}.png")
    pose = np.eye(4); pose[2, 3] = 4.0
    (scene / "transforms_test.json").write_text(json.dumps({
        "camera_angle_x": 0.8,
        "frames": [{"file_path": f"./test/r_{i}",
                    "transform_matrix": pose.tolist()} for i in range(3)],
    }))

    cfg_path = _write_config(tmp_path, h=16, w=16, WHITE_BKGD=True)
    ckpt = _make_ckpt(tmp_path, cfg_path)
    report = run_evaluation([
        "--config", cfg_path, "--checkpoint", ckpt,
        "--data", "blender", "--data-dir", str(scene),
        "--split", "test", "--chunk", "128",
        "--out", str(tmp_path / "b.json"),
    ])
    assert len(report["views"]) == 3
    assert np.isfinite(report["mean"]["psnr"])
    # --split test is blender-only
    with pytest.raises(SystemExit):
        run_evaluation([
            "--config", cfg_path, "--checkpoint", ckpt,
            "--data", "synthetic", "--split", "test",
        ])


def test_eval_ndc_checkpoint_scores_in_ndc_ray_space(tmp_path, monkeypatch):
    """An NDC-trained checkpoint must be scored on NDC-reparameterized
    rays with [0,1] bounds (exactly what cli/train.py trained on) — a
    world-space-ray eval raises no error, it just records meaningless
    metrics.  The sidecar flips cfg.ndc even when the passed config lacks
    it, and the dataset is passed through dataset_to_ndc."""
    import nerf_keras_tpu.cli.evaluate as ev
    from nerf_keras_tpu.config import NeRFConfig, load_config
    from nerf_keras_tpu.data.llff import prepare_fern_data
    from nerf_keras_tpu.data.pipeline import dataset_to_ndc

    # forward-facing capture (same recipe as tests/test_infer.py)
    from PIL import Image

    rng = np.random.default_rng(11)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    n, h, w = 4, 12, 16
    for i in range(n):
        arr = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"img_{i:02d}.png")
    poses = np.zeros((n, 3, 5), dtype=np.float64)
    for i in range(n):
        poses[i, :, 0] = [0, -1, 0]
        poses[i, :, 1] = [1, 0, 0]
        poses[i, :, 2] = [0, 0, 1]
        poses[i, :, 3] = [0.1 * i, 0.05 * i, 4.0 + 0.1 * i]
        poses[i, :, 4] = [h, w, 20.0]
    bds = np.stack([np.full(n, 2.0), np.full(n, 6.0)], axis=1)
    np.save(tmp_path / "poses_bounds.npy",
            np.concatenate([poses.reshape(n, -1), bds], axis=1))

    cfg_path = _write_config(tmp_path, h=h, w=w)  # config WITHOUT NDC
    trained = load_config(cfg_path)
    import dataclasses
    trained = dataclasses.replace(trained, ndc=True).validate()
    state = init_train_state(jax.random.PRNGKey(0), trained)
    ckpt = str(tmp_path / "ndc.ckpt.npz")
    save_checkpoint(ckpt, state, trained,
                    scene={"near": 0.0, "far": 1.0, "focal": 20.0,
                           "ndc": True})

    seen = {}
    real = ev.evaluate_views

    def spy(trainer, ds, **kw):
        seen["ndc"] = trainer.cfg.ndc
        seen["bounds"] = (trainer.near, trainer.far, ds.near, ds.far)
        seen["origins"] = np.asarray(ds.origins)
        return real(trainer, ds, **kw)

    monkeypatch.setattr(ev, "evaluate_views", spy)
    report = ev.run_evaluation([
        "--config", cfg_path, "--checkpoint", ckpt,
        "--data", "llff", "--data-dir", str(tmp_path),
        "--chunk", "128", "--out", str(tmp_path / "ndc_eval.json"),
    ])
    assert seen["ndc"] is True
    assert seen["bounds"] == (0.0, 1.0, 0.0, 1.0)
    # the scored rays are exactly dataset_to_ndc(world-space val split)
    _, val_ds, _, _ = prepare_fern_data(h, w, basedir=str(tmp_path))
    expect = dataset_to_ndc(val_ds)
    np.testing.assert_allclose(seen["origins"], expect.origins, rtol=1e-6)
    assert np.isfinite(report["mean"]["psnr"])
