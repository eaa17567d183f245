"""Pipeline, synthetic dataset, LLFF pose math, checkpoint roundtrip."""

import json
import os
import numpy as np
import jax
import pytest

from nerf_keras_tpu.config import NeRFConfig
from nerf_keras_tpu.data import RayDataset, iterate_batches, prepare_synthetic_data
from nerf_keras_tpu.data.llff import (
    average_pose,
    recenter_poses,
    spherify_poses,
    spiral_render_path,
    view_matrix,
)
from nerf_keras_tpu.engine.step import init_train_state
from nerf_keras_tpu.utils.checkpoint import (
    checkpoint_name,
    load_checkpoint,
    save_checkpoint,
)


# ------------------------------------------------------------- pipeline
def _tiny_dataset(n=100):
    rng = np.random.default_rng(0)
    return RayDataset(
        pixels=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        origins=rng.normal(size=(n, 3)).astype(np.float32),
        directions=rng.normal(size=(n, 3)).astype(np.float32),
        near=2.0, far=6.0, focal=50.0, height=10, width=10,
    )


def test_iterate_batches_shapes_and_drop_remainder():
    ds = _tiny_dataset(100)
    batches = list(iterate_batches(ds, 32, shuffle=False))
    assert len(batches) == 3  # 100 // 32, remainder dropped
    for px, o, d in batches:
        assert px.shape == (32, 3) and o.shape == (32, 3) and d.shape == (32, 3)


def test_iterate_batches_shuffle_is_permutation():
    ds = _tiny_dataset(64)
    batches = list(iterate_batches(ds, 64, shuffle=True, seed=1, epoch=0))
    got = np.sort(batches[0][0], axis=0)
    expected = np.sort(ds.pixels, axis=0)
    np.testing.assert_array_equal(got, expected)
    # different epoch -> different order
    b2 = list(iterate_batches(ds, 64, shuffle=True, seed=1, epoch=1))
    assert not np.array_equal(batches[0][0], b2[0][0])
    # same (seed, epoch) reproduces exactly (multi-host determinism)
    b3 = list(iterate_batches(ds, 64, shuffle=True, seed=1, epoch=0))
    np.testing.assert_array_equal(batches[0][0], b3[0][0])


def test_process_slice():
    ds = _tiny_dataset(100)
    s0 = ds.process_slice(0, 4)
    s3 = ds.process_slice(3, 4)
    assert len(s0) == 25 and len(s3) == 25
    np.testing.assert_array_equal(s0.pixels, ds.pixels[:25])
    np.testing.assert_array_equal(s3.pixels, ds.pixels[75:100])


def test_image_recovery():
    train, val, bounds, focal = prepare_synthetic_data(8, 12, num_views=5)
    img = train.image(0)
    assert img.shape == (8, 12, 3)
    assert train.num_images == 4 and val.num_images == 1
    o, d = train.image_rays(1)
    assert o.shape == (8 * 12, 3)


# ------------------------------------------------------------- synthetic
def test_synthetic_scene_properties():
    train, val, (near, far), focal = prepare_synthetic_data(16, 16, num_views=10)
    assert near == 2.0 and far == 6.0
    # scene has both background (white) and sphere pixels
    assert train.pixels.max() > 0.95
    assert train.pixels.min() < 0.6
    # rays are valid directions
    norms = np.linalg.norm(train.directions, axis=-1)
    assert (norms > 0.5).all()


def test_synthetic_multi_object_scene():
    train, val, (near, far), focal = prepare_synthetic_data(
        20, 20, num_views=8, scene="spheres"
    )
    assert near == 2.0 and far == 6.0
    px = train.pixels
    assert px.shape == (6 * 400, 3) and px.dtype == np.float32
    assert px.min() >= 0.0 and px.max() <= 1.0
    # background (white), shadowed floor (dark), and at least three distinct
    # sphere albedos must all be visible across the train views
    assert px.max() > 0.95 and px.min() < 0.3
    # color diversity: per-channel argmax pixels differ (orange vs blue vs
    # green dominate different channels)
    dominant = px.argmax(axis=-1)
    assert len(np.unique(dominant)) == 3

    with pytest.raises(ValueError):
        prepare_synthetic_data(8, 8, scene="torus")
    with pytest.raises(ValueError):
        prepare_synthetic_data(8, 8, holdout="random")


def test_synthetic_holdout_modes():
    """spheres defaults to an interleaved holdout (tail = a contiguous
    unseen azimuth sector on an orbit — extrapolation, not novel-view
    interpolation); sphere keeps the reference tail protocol.  Both modes
    partition the views and keep the same train/val sizes."""
    tr_t, va_t, _, _ = prepare_synthetic_data(
        10, 10, num_views=12, scene="spheres", holdout="tail"
    )
    tr_i, va_i, _, _ = prepare_synthetic_data(
        10, 10, num_views=12, scene="spheres"
    )
    assert tr_t.num_images == tr_i.num_images == 9
    assert va_t.num_images == va_i.num_images == 3
    # interleave picks different (spread) views than the tail slice
    assert not np.array_equal(va_t.pixels, va_i.pixels)
    # partition: every interleaved val view differs from every train view
    tr_imgs = [tr_i.image(k) for k in range(tr_i.num_images)]
    for k in range(va_i.num_images):
        v = va_i.image(k)
        assert all(not np.array_equal(v, timg) for timg in tr_imgs)


def test_synthetic_scene_geometry_within_bounds():
    """Every non-background hit in the multi-object scene must lie inside
    the [near, far] shell of its camera, or training t-vals can't reach it."""
    from nerf_keras_tpu.data.synthetic import (
        _FLOOR_R,
        _FLOOR_Z,
        _SPHERES,
    )

    cam_radius = 4.0
    # sphere extents
    for center, r, _ in _SPHERES:
        assert np.linalg.norm(center) + r <= cam_radius - 2.0 + 1e-6
    # floor disk corner distance from any orbit camera position
    corner = np.sqrt(_FLOOR_R**2 + _FLOOR_Z**2)
    assert cam_radius + corner <= 6.0 + 1e-6


# ------------------------------------------------------------- llff math
def test_view_matrix_orthonormal(rng):
    z = rng.standard_normal(3)
    up = rng.standard_normal(3)
    pos = rng.standard_normal(3)
    m = view_matrix(z, up, pos)
    assert m.shape == (3, 4)
    r = m[:, :3]
    np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(m[:, 3], pos)
    np.testing.assert_allclose(r[:, 2], z / np.linalg.norm(z), atol=1e-6)


def _random_poses(rng, n=12):
    poses = []
    for _ in range(n):
        q, _r = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = rng.standard_normal(3) * 0.3 + np.array([0, 0, 4.0])
        hwf = np.array([[100.0], [120.0], [90.0]])
        poses.append(np.concatenate([q, t[:, None], hwf], axis=1))
    return np.stack(poses).astype(np.float32)


def test_recenter_poses_average_becomes_identity(rng):
    poses = _random_poses(rng)
    centered = recenter_poses(poses)
    avg = average_pose(centered)
    np.testing.assert_allclose(avg[:, :3], np.eye(3), atol=1e-4)
    np.testing.assert_allclose(avg[:, 3], 0.0, atol=1e-4)
    # hwf column preserved
    np.testing.assert_allclose(centered[:, :, 4], poses[:, :, 4])


def test_spiral_render_path_properties(rng):
    poses = _random_poses(rng)
    avg = average_pose(poses)
    up = poses[:, :, 1].sum(0)
    up = up / np.linalg.norm(up)
    path = spiral_render_path(avg, up, np.array([0.5, 0.5, 0.2]), 3.0, 0.5, 2, 40)
    assert path.shape == (40, 3, 5)
    for p in path[::10]:
        r = p[:, :3]
        np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-5)


def test_spherify_poses_unit_radius(rng):
    poses = _random_poses(rng, n=16)
    bds = np.stack([np.full(16, 2.0), np.full(16, 6.0)], axis=1).astype(np.float32)
    reset, orbit, new_bds = spherify_poses(poses, bds)
    rad = np.sqrt(np.mean(np.sum(reset[:, :, 3] ** 2, axis=-1)))
    np.testing.assert_allclose(rad, 1.0, rtol=1e-5)
    assert orbit.shape == (120, 3, 5)


# ------------------------------------------------------------- checkpoint
def test_checkpoint_roundtrip(tmp_path):
    cfg = NeRFConfig(batch_size=8, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / checkpoint_name(cfg))
    save_checkpoint(path, state, cfg)

    template = init_train_state(jax.random.PRNGKey(1), cfg)
    restored = load_checkpoint(path, template)
    w_orig = np.asarray(state.params["coarse"]["trunk"][0]["w"])
    w_rest = np.asarray(restored.params["coarse"]["trunk"][0]["w"])
    np.testing.assert_array_equal(w_orig, w_rest)
    assert int(restored.step) == int(state.step)
    # optimizer state restored too (the reference cannot do this)
    o_leaves = jax.tree_util.tree_leaves(state.opt_state)
    r_leaves = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(o_leaves) == len(r_leaves)


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    cfg = NeRFConfig(batch_size=8, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "c.ckpt.npz")
    save_checkpoint(path, state)
    cfg2 = NeRFConfig(batch_size=8, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=32)
    template = init_train_state(jax.random.PRNGKey(0), cfg2)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_checkpoint(path, template)


def test_bn_checkpoint_roundtrip(tmp_path):
    cfg = NeRFConfig(
        batch_size=8, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16,
        batch_norm=True,
    )
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "bn.ckpt.npz")
    save_checkpoint(path, state, cfg)
    restored = load_checkpoint(path, init_train_state(jax.random.PRNGKey(2), cfg))
    np.testing.assert_array_equal(
        np.asarray(state.bn["fine"]["trunk"][1]["var"]),
        np.asarray(restored.bn["fine"]["trunk"][1]["var"]),
    )


def test_prepare_fern_data_end_to_end(tmp_path):
    """Full LLFF pipeline against a synthetic on-disk capture:
    poses_bounds.npy parsing, axis reorder, bound rescale, recentering,
    holdout split, ray flattening (reference fern_data_utils.py:369-520)."""
    from PIL import Image

    from nerf_keras_tpu.data.llff import load_llff_data, prepare_fern_data

    rng = np.random.default_rng(11)
    n, h, w = 4, 12, 16
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for i in range(n):
        arr = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"img_{i:02d}.png")

    # LLFF convention: rows are [down, right, back] axes; hwf column.
    poses = np.zeros((n, 3, 5), dtype=np.float64)
    for i in range(n):
        # cameras on a small arc looking at -z
        poses[i, :, 0] = [0, -1, 0]   # down
        poses[i, :, 1] = [1, 0, 0]    # right
        poses[i, :, 2] = [0, 0, 1]    # back
        poses[i, :, 3] = [0.1 * i, 0.05 * i, 4.0 + 0.1 * i]
        poses[i, :, 4] = [h, w, 20.0]
    bds = np.stack([np.full(n, 2.0), np.full(n, 6.0)], axis=1)
    arr = np.concatenate([poses.reshape(n, -1), bds], axis=1)
    np.save(tmp_path / "poses_bounds.npy", arr)

    images, p, b, render_poses, i_hold = load_llff_data(
        str(tmp_path), factor=1, recenter=True, bd_factor=0.75
    )
    assert images.shape == (n, h, w, 3)
    assert p.shape == (n, 3, 5)
    assert render_poses.shape[1:] == (3, 5)
    assert 0 <= i_hold < n

    train, val, (near, far), focal = prepare_fern_data(
        h, w, basedir=str(tmp_path), factor=1
    )
    assert len(train) == (n - 1) * h * w
    assert len(val) == 1 * h * w
    assert near < far
    assert focal > 0
    # bounds follow the reference recipe: near=0.9*min, far=max (rescaled)
    np.testing.assert_allclose(near / far, (2.0 * 0.9) / 6.0, rtol=1e-5)


def test_synthetic_non_square_images():
    """H != W must work end to end (the reference's Lego loader builds val
    rays with get_rays(H, H, ...) and breaks for non-square images,
    lego_data_utils.py:34 — fixed here by construction)."""
    from nerf_keras_tpu.data.synthetic import prepare_synthetic_data

    train, val, (near, far), focal = prepare_synthetic_data(12, 20, num_views=4)
    assert train.height == 12 and train.width == 20
    assert len(train) % (12 * 20) == 0
    o, d = val.image_rays(0)
    assert o.shape == (12 * 20, 3) and d.shape == (12 * 20, 3)
    img = val.image(0)
    assert img.shape == (12, 20, 3)


def test_prepare_lego_data_end_to_end(tmp_path):
    """Full prepare_lego_data run against an on-disk npz with the real
    tiny_nerf_data.npz key layout (images/poses/focal) — including a
    NON-square target, which crashes the reference (its val rays are
    built with get_rays(H, H, ...), lego_data_utils.py:34)."""
    import numpy as np

    from nerf_keras_tpu.data.lego import prepare_lego_data

    rng = np.random.default_rng(0)
    n, h0, w0 = 10, 20, 20
    images = rng.uniform(0, 1, (n, h0, w0, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 2, 3] = np.linspace(3.5, 4.5, n)  # distinct camera distances
    path = str(tmp_path / "tiny_nerf_data.npz")
    np.savez(path, images=images, poses=poses, focal=np.float64(25.3))

    th, tw = 12, 10  # non-square
    train, val, (near, far), focal = prepare_lego_data(th, tw, path=path)

    assert (near, far) == (2.0, 6.0)
    # Focal rescales with the resize (geometric-mean ratio for the
    # anisotropic case) — the reference keeps the native focal, giving
    # resized configs a wrong FOV (pipeline.rescale_focal docstring).
    assert focal == pytest.approx(25.3 * np.sqrt((th / h0) * (tw / w0)))
    # 80/20 split by index: 8 train / 2 val images, flattened per-pixel
    assert len(train) == 8 * th * tw
    assert len(val) == 2 * th * tw
    assert train.height == val.height == th
    assert train.width == val.width == tw
    # ray origins come from the pose translation column
    np.testing.assert_allclose(
        train.origins[0], [0, 0, poses[0, 2, 3]], atol=1e-6
    )
    np.testing.assert_allclose(
        val.origins[0], [0, 0, poses[8, 2, 3]], atol=1e-6
    )
    # directions are unit-ish rays through the pixel grid, one per pixel
    assert np.abs(train.directions[:, 2] + 1.0).max() < 1e-6
    # resize happened: pixel rows in [0, 1]
    assert train.pixels.min() >= 0.0 and train.pixels.max() <= 1.0


def test_find_lego_npz_resolution_order(tmp_path, monkeypatch):
    from nerf_keras_tpu.data.lego import find_lego_npz

    import numpy as np

    env_dir = tmp_path / "env"
    env_dir.mkdir()
    env_file = env_dir / "tiny_nerf_data.npz"
    np.savez(str(env_file), images=np.zeros((1, 2, 2, 3)))
    monkeypatch.setenv("NERF_DATA_DIR", str(env_dir))
    assert find_lego_npz() == str(env_file)

    # explicit path wins over NERF_DATA_DIR
    direct = tmp_path / "direct.npz"
    np.savez(str(direct), images=np.zeros((1, 2, 2, 3)))
    assert find_lego_npz(str(direct)) == str(direct)


@pytest.mark.slow
def test_train_synthetic_spheres_cli_end_to_end(tmp_path, capsys):
    """--scene spheres trains end-to-end through the real CLI path (the
    flag rides the generic --scene passthrough) and training reduces the
    loss on the multi-object scene."""
    import train_synthetic
    from nerf_keras_tpu.cli.train import run_training

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "BATCH_SIZE": 128, "NS_COARSE": 4, "NS_FINE": 8,
        "HEIGHT": 12, "WIDTH": 12, "L_XYZ": 4, "L_DIR": 2,
        "NUM_LAYERS": 2, "HIDDEN_DIM": 16, "SKIP_LAYER": 4, "EPOCHS": 3,
        "LEARNING_RATE": 0.002, "BATCH_NORM": False, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32", "EVAL_EVERY": 3,
    }))
    run_dir = tmp_path / "run"
    trainer = run_training(
        train_synthetic.prepare, str(cfg_path), default_eval_every=1,
        argv=["--config", str(cfg_path), "--run-dir", str(run_dir),
              "--scene", "spheres"],
    )
    hist = json.load(open(run_dir / "history_l2_d16_n12_ep3.json"))
    assert hist["losses"][-1] < hist["losses"][0]
    assert (run_dir / "nerf_l2_d16_n12_ep3.ckpt.npz").exists()

    # --views passthrough: 16 views -> 16*0.8=12 train views = 1728 rays
    # (the playbook's add-views diagnostic must be reachable from the CLI).
    out = capsys.readouterr()
    run_training(
        train_synthetic.prepare, str(cfg_path), default_eval_every=1,
        argv=["--config", str(cfg_path),
              "--run-dir", str(tmp_path / "run_v16"),
              "--scene", "spheres", "--views", "16"],
    )
    out = capsys.readouterr().out
    assert "train=1728" in out  # 16 views, 12x12, 80/20 interleave split


def test_train_fern_cli_end_to_end(tmp_path, capsys):
    """The fern entry point trains end-to-end (BatchNorm variant) against a
    synthetic on-disk LLFF capture — loader, config, trainer, checkpoint,
    panel and history all through the real CLI path."""
    from PIL import Image

    from nerf_keras_tpu.cli.train import run_training
    from nerf_keras_tpu.data.llff import prepare_fern_data

    rng = np.random.default_rng(11)
    n, h, w = 5, 24, 32
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for i in range(n):
        arr = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"img_{i:02d}.png")
    poses = np.zeros((n, 3, 5))
    for i in range(n):
        poses[i, :, 0] = [0, -1, 0]
        poses[i, :, 1] = [1, 0, 0]
        poses[i, :, 2] = [0, 0, 1]
        poses[i, :, 3] = [0.1 * i, 0.05 * i, 4.0 + 0.1 * i]
        poses[i, :, 4] = [h, w, 20.0]
    bds = np.stack([np.full(n, 2.0), np.full(n, 6.0)], axis=1)
    np.save(tmp_path / "poses_bounds.npy",
            np.concatenate([poses.reshape(n, -1), bds], axis=1))

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "BATCH_SIZE": 128, "TEST_BATCH_SIZE": 64, "NS_COARSE": 4,
        "NS_FINE": 8, "HEIGHT": 12, "WIDTH": 16, "L_XYZ": 10, "L_DIR": 4,
        "NUM_LAYERS": 2, "HIDDEN_DIM": 16, "SKIP_LAYER": 4, "EPOCHS": 2,
        "LEARNING_RATE": 0.001, "BATCH_NORM": True, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32", "EVAL_EVERY": 2,
    }))
    run_dir = tmp_path / "run"

    def prepare(height, width, data_dir=None):
        return prepare_fern_data(height, width, basedir=data_dir)

    trainer = run_training(
        prepare, str(cfg_path), default_eval_every=1,
        argv=["--config", str(cfg_path), "--data-dir", str(tmp_path),
              "--run-dir", str(run_dir)],
    )
    assert int(trainer.state.step) == 2 * (768 // 128)
    assert (run_dir / "nerf_l2_d16_n12_ep2.ckpt.npz").exists()
    assert (run_dir / "images" / "001.png").exists()
    out = capsys.readouterr().out
    assert "val:" in out


@pytest.mark.slow
def test_train_fern_ndc_end_to_end(tmp_path, capsys):
    """NDC training path (NeRFConfig.ndc, absent from the reference):
    rays reparameterized into NDC, t sampled in [0, 1], loss finite and
    decreasing, sidecar records the NDC flag."""
    from PIL import Image

    from nerf_keras_tpu.cli.train import run_training
    from nerf_keras_tpu.data.llff import prepare_fern_data

    rng = np.random.default_rng(11)
    n, h, w = 5, 24, 32
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for i in range(n):
        arr = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"img_{i:02d}.png")
    poses = np.zeros((n, 3, 5))
    for i in range(n):
        poses[i, :, 0] = [0, -1, 0]
        poses[i, :, 1] = [1, 0, 0]
        poses[i, :, 2] = [0, 0, 1]
        poses[i, :, 3] = [0.1 * i, 0.05 * i, 4.0 + 0.1 * i]
        poses[i, :, 4] = [h, w, 20.0]
    bds = np.stack([np.full(n, 2.0), np.full(n, 6.0)], axis=1)
    np.save(tmp_path / "poses_bounds.npy",
            np.concatenate([poses.reshape(n, -1), bds], axis=1))

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "BATCH_SIZE": 128, "NS_COARSE": 4, "NS_FINE": 8,
        "HEIGHT": 12, "WIDTH": 16, "L_XYZ": 4, "L_DIR": 2,
        "NUM_LAYERS": 2, "HIDDEN_DIM": 16, "SKIP_LAYER": 4, "EPOCHS": 2,
        "LEARNING_RATE": 0.001, "BATCH_NORM": False, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32", "EVAL_EVERY": 2, "NDC": True,
    }))
    run_dir = tmp_path / "run"

    def prepare(height, width, data_dir=None):
        return prepare_fern_data(height, width, basedir=data_dir)

    trainer = run_training(
        prepare, str(cfg_path), default_eval_every=1,
        argv=["--config", str(cfg_path), "--data-dir", str(tmp_path),
              "--run-dir", str(run_dir)],
    )
    # Trainer carries NDC bounds.
    assert (trainer.near, trainer.far) == (0.0, 1.0)
    out = capsys.readouterr().out
    assert "near=0.000 far=1.000" in out

    from nerf_keras_tpu.utils.checkpoint import load_checkpoint_scene

    scene = load_checkpoint_scene(str(run_dir / "nerf_l2_d16_n12_ep2.ckpt.npz"))
    assert scene["ndc"] is True or scene["ndc"] == 1
    assert scene["near"] == 0.0 and scene["far"] == 1.0


def test_rescale_focal_preserves_fov():
    """The rescaled focal keeps each pixel's angular extent: the half-FOV
    of the resized camera matches the original for isotropic resizes."""
    from nerf_keras_tpu.data.pipeline import rescale_focal

    f0, h0, w0 = 138.9, 100, 100
    f1 = rescale_focal(f0, h0, w0, 25, 25)
    # half-FOV = atan((W/2)/f): must be equal before and after
    np.testing.assert_allclose(
        np.arctan((w0 / 2) / f0), np.arctan((25 / 2) / f1), rtol=1e-6
    )
    # identity when no resize
    assert rescale_focal(f0, h0, w0, h0, w0) == pytest.approx(f0)


def test_history_load_roundtrip(tmp_path):
    from nerf_keras_tpu.utils.metrics import History

    h = History()
    h.append({"loss_coarse": 0.2, "loss": 0.1, "psnr": 11.0})
    h.append({"loss_coarse": 0.1, "loss": 0.05, "psnr": 14.0},
             {"loss": 0.07, "psnr": 12.0})
    p = str(tmp_path / "hist.json")
    h.save(p)
    h2 = History.load(p)
    assert h2.to_dict() == h.to_dict()
    # appends continue the record
    h2.append({"loss_coarse": 0.05, "loss": 0.02, "psnr": 17.0})
    assert len(h2.losses) == 3 and h2.losses[0] == 0.1


def test_llff_render_path_poses_only_and_n_frames(tmp_path):
    """load_llff_render_path reads only poses_bounds.npy and honors
    n_frames on BOTH the spiral and the spherified branch (spherify_poses
    emits a fixed 120-pose orbit internally)."""
    from nerf_keras_tpu.data.llff import load_llff_render_path

    rng = np.random.default_rng(5)
    n = 6
    poses = np.zeros((n, 3, 5))
    for i in range(n):
        # small random rotations: identical orientations make the
        # spherify least-squares (parallel view dirs) singular
        q, _ = np.linalg.qr(np.eye(3) + 0.15 * rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        down, right, back = -q[:, 1], q[:, 0], q[:, 2]
        poses[i, :, 0] = down
        poses[i, :, 1] = right
        poses[i, :, 2] = back
        poses[i, :, 3] = rng.uniform(-0.3, 0.3, 3) + [0, 0, 4.0]
        poses[i, :, 4] = [24, 32, 30.0]
    bds = np.stack([np.full(n, 2.0), np.full(n, 6.0)], axis=1)
    np.save(tmp_path / "poses_bounds.npy",
            np.concatenate([poses.reshape(n, -1), bds], axis=1))
    # NOTE: no images/ directory on disk at all

    spiral = load_llff_render_path(str(tmp_path), n_frames=17)
    assert spiral.shape == (17, 3, 5)
    orbit = load_llff_render_path(str(tmp_path), spherify=True, n_frames=30)
    assert orbit.shape == (30, 3, 5)


@pytest.mark.slow
def test_train_cli_autofills_lr_decay_horizon(tmp_path, capsys):
    """LR_DECAY_STEPS=0 (auto) resolves to epochs * steps-per-epoch in the
    train CLI, and the resolved horizon lands in the checkpoint sidecar so
    resume/inference rebuild the same optimizer."""
    import json as _json

    from nerf_keras_tpu.cli.train import run_training
    from nerf_keras_tpu.data.synthetic import prepare_synthetic_data

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(_json.dumps({
        "BATCH_SIZE": 128, "NS_COARSE": 4, "NS_FINE": 8, "HEIGHT": 16,
        "WIDTH": 16, "L_XYZ": 4, "L_DIR": 2, "NUM_LAYERS": 2,
        "HIDDEN_DIM": 16, "SKIP_LAYER": 1, "EPOCHS": 2,
        "LEARNING_RATE": 0.002, "BATCH_NORM": False, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32", "EVAL_EVERY": 2,
        "LR_FINAL": 2e-5, "EMA_DECAY": 0.9,
    }))
    run_dir = tmp_path / "run"

    def prepare(height, width, data_dir=None):
        return prepare_synthetic_data(height, width)

    trainer = run_training(
        prepare, str(cfg_path), default_eval_every=1,
        argv=["--config", str(cfg_path), "--run-dir", str(run_dir)],
    )
    steps = int(trainer.state.step)
    assert trainer.cfg.lr_decay_steps == steps  # 2 epochs fully decayed
    assert trainer.state.ema is not None
    out = capsys.readouterr().out
    assert "lr decay: 0.002 -> 2e-05" in out, out
    sidecars = list(run_dir.glob("*.ckpt.npz.config.json"))
    assert sidecars, list(run_dir.iterdir())
    side = _json.loads(sidecars[0].read_text())
    assert side["LR_DECAY_STEPS"] == steps
    assert side["EMA_DECAY"] == 0.9


def test_train_cli_autofills_proposal_anneal_horizon(tmp_path, capsys):
    """PROP_ANNEAL_STEPS=-1 (auto) resolves to epochs * steps-per-epoch in
    the train CLI (same accounting as the LR horizon) and the resolved
    count lands in the checkpoint sidecar."""
    import json as _json

    from nerf_keras_tpu.cli.train import run_training
    from nerf_keras_tpu.data.synthetic import prepare_synthetic_data

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(_json.dumps({
        "BATCH_SIZE": 128, "NS_COARSE": 4, "NS_FINE": 8, "HEIGHT": 16,
        "WIDTH": 16, "L_XYZ": 4, "L_DIR": 2, "NUM_LAYERS": 2,
        "HIDDEN_DIM": 16, "SKIP_LAYER": 1, "EPOCHS": 2,
        "LEARNING_RATE": 0.002, "BATCH_NORM": False, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32", "EVAL_EVERY": 2,
        "TRAIN_SAMPLER": "proposal", "PROP_ANNEAL_STEPS": -1,
    }))
    run_dir = tmp_path / "run"

    def prepare(height, width, data_dir=None):
        return prepare_synthetic_data(height, width)

    trainer = run_training(
        prepare, str(cfg_path), default_eval_every=1,
        argv=["--config", str(cfg_path), "--run-dir", str(run_dir)],
    )
    steps = int(trainer.state.step)
    assert trainer.cfg.prop_anneal_steps == steps  # full-horizon anneal
    out = capsys.readouterr().out
    assert f"proposal anneal over {steps} steps" in out, out
    sidecars = list(run_dir.glob("*.ckpt.npz.config.json"))
    assert sidecars, list(run_dir.iterdir())
    side = _json.loads(sidecars[0].read_text())
    assert side["PROP_ANNEAL_STEPS"] == steps


# ------------------------------------------------- Blender nerf_synthetic
def _write_blender_scene(root, *, n_train=4, n_val=3, h=16, w=16,
                         angle_x=0.8, with_val=True):
    """Minimal on-disk nerf_synthetic scene: transforms json + RGBA PNGs.

    The top-left quadrant of every image is opaque mid-gray, the rest
    fully transparent — so background compositing is checkable exactly.
    """
    from PIL import Image

    def write_split(split, n):
        (root / split).mkdir(parents=True, exist_ok=True)
        frames = []
        for i in range(n):
            rgba = np.zeros((h, w, 4), np.uint8)
            rgba[: h // 2, : w // 2] = [100, 150, 200, 255]
            Image.fromarray(rgba, "RGBA").save(root / split / f"r_{i}.png")
            pose = np.eye(4)
            pose[2, 3] = 4.0 + 0.1 * i
            frames.append({
                "file_path": f"./{split}/r_{i}",
                "transform_matrix": pose.tolist(),
            })
        (root / f"transforms_{split}.json").write_text(
            json.dumps({"camera_angle_x": angle_x, "frames": frames})
        )

    write_split("train", n_train)
    if with_val:
        write_split("val", n_val)
    return root


def test_load_blender_split_compositing_and_skip(tmp_path):
    from nerf_keras_tpu.data.blender import load_blender_split

    _write_blender_scene(tmp_path, n_train=5, h=8, w=8)
    imgs, poses, angle = load_blender_split(str(tmp_path), "train",
                                            white_bkgd=True)
    assert imgs.shape == (5, 8, 8, 3) and poses.shape == (5, 4, 4)
    assert angle == pytest.approx(0.8)
    # opaque quadrant keeps its color; transparent region becomes white
    np.testing.assert_allclose(imgs[0, 0, 0], np.array([100, 150, 200]) / 255,
                               atol=1e-6)
    np.testing.assert_allclose(imgs[0, -1, -1], [1.0, 1.0, 1.0], atol=1e-6)
    black, _, _ = load_blender_split(str(tmp_path), "train", white_bkgd=False)
    np.testing.assert_allclose(black[0, -1, -1], [0.0, 0.0, 0.0], atol=1e-6)
    # every=2 keeps frames 0, 2, 4 (poses prove which frames survived)
    sub, sub_poses, _ = load_blender_split(str(tmp_path), "train",
                                           white_bkgd=True, every=2)
    assert sub.shape[0] == 3
    np.testing.assert_allclose(sub_poses[:, 2, 3], [4.0, 4.2, 4.4], atol=1e-6)


def test_prepare_blender_data_end_to_end(tmp_path):
    from nerf_keras_tpu.data.blender import prepare_blender_data

    _write_blender_scene(tmp_path, n_train=4, n_val=3, h=16, w=16,
                         angle_x=0.9)
    th, tw = 8, 8
    train, val, (near, far), focal = prepare_blender_data(
        th, tw, path=str(tmp_path), val_every=1
    )
    assert (near, far) == (2.0, 6.0)
    # focal = W/2 / tan(angle_x/2) at native res, rescaled by the resize
    native = 0.5 * 16 / np.tan(0.45)
    assert focal == pytest.approx(native * 0.5, rel=1e-6)
    assert len(train) == 4 * th * tw and len(val) == 3 * th * tw
    # origins come from the 4x4 transform_matrix translation
    np.testing.assert_allclose(train.origins[0], [0, 0, 4.0], atol=1e-6)
    np.testing.assert_allclose(val.origins[0], [0, 0, 4.0], atol=1e-6)


def test_prepare_blender_data_val_fallback(tmp_path):
    """A scene without transforms_val.json holds out the train tail 80/20."""
    from nerf_keras_tpu.data.blender import prepare_blender_data

    _write_blender_scene(tmp_path, n_train=5, with_val=False, h=8, w=8)
    train, val, _, _ = prepare_blender_data(8, 8, path=str(tmp_path))
    assert len(train) == 4 * 64 and len(val) == 1 * 64


def test_find_blender_scene_resolution(tmp_path, monkeypatch):
    from nerf_keras_tpu.data.blender import find_blender_scene

    scene = tmp_path / "nerf_synthetic" / "ship"
    _write_blender_scene(scene, n_train=1, with_val=False, h=4, w=4)
    monkeypatch.setenv("NERF_DATA_DIR", str(tmp_path))
    assert find_blender_scene(scene="ship") == str(scene)
    with pytest.raises(FileNotFoundError):
        find_blender_scene(scene="chair")


@pytest.mark.slow
def test_train_blender_cli_end_to_end(tmp_path, capsys):
    """The Blender entry point trains end-to-end through run_training,
    including the config-aware prepare hook (WHITE_BKGD reaches the
    loader's compositing)."""
    from train_blender import prepare
    from nerf_keras_tpu.cli.train import run_training

    scene = tmp_path / "scene"
    _write_blender_scene(scene, n_train=4, n_val=2, h=16, w=16)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "BATCH_SIZE": 128, "NS_COARSE": 4, "NS_FINE": 8, "HEIGHT": 12,
        "WIDTH": 12, "L_XYZ": 4, "L_DIR": 2, "NUM_LAYERS": 2,
        "HIDDEN_DIM": 16, "SKIP_LAYER": 1, "EPOCHS": 1,
        "LEARNING_RATE": 0.001, "BATCH_NORM": False, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32", "EVAL_EVERY": 1, "WHITE_BKGD": True,
    }))
    run_dir = tmp_path / "run"
    trainer = run_training(
        prepare, str(cfg_path), default_eval_every=1,
        argv=["--config", str(cfg_path), "--data-dir", str(scene),
              "--run-dir", str(run_dir)],
    )
    assert int(trainer.state.step) == (4 * 12 * 12) // 128
    assert list(run_dir.glob("*.ckpt.npz"))
    assert "val:" in capsys.readouterr().out


def test_train_blender_scene_flag(tmp_path):
    """--scene selects a scene under a dataset-root --data-dir; entry
    points whose loader lacks a scene param reject the flag."""
    from train_blender import prepare as blender_prepare
    from nerf_keras_tpu.cli.train import run_training
    from nerf_keras_tpu.data.blender import find_blender_scene
    from nerf_keras_tpu.data.synthetic import prepare_synthetic_data

    root = tmp_path / "nerf_synthetic"
    _write_blender_scene(root / "drums", n_train=2, with_val=False, h=8, w=8)
    # root resolution: path/scene and path/nerf_synthetic/scene both work
    assert find_blender_scene(str(root), "drums") == str(root / "drums")
    assert find_blender_scene(str(tmp_path), "drums") == str(root / "drums")

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "BATCH_SIZE": 32, "NS_COARSE": 4, "NS_FINE": 4, "HEIGHT": 8,
        "WIDTH": 8, "L_XYZ": 2, "L_DIR": 1, "NUM_LAYERS": 2,
        "HIDDEN_DIM": 16, "SKIP_LAYER": 4, "EPOCHS": 1,
        "LEARNING_RATE": 0.001, "BATCH_NORM": False, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32",
    }))
    trainer = run_training(
        blender_prepare, str(cfg_path), default_eval_every=5,
        argv=["--config", str(cfg_path), "--data-dir", str(root),
              "--scene", "drums", "--run-dir", str(tmp_path / "run")],
    )
    assert int(trainer.state.step) >= 1

    with pytest.raises(SystemExit, match="--scene is not supported"):
        run_training(
            lambda h, w, data_dir=None: prepare_synthetic_data(h, w),
            str(cfg_path), default_eval_every=5,
            argv=["--config", str(cfg_path), "--scene", "drums",
                  "--run-dir", str(tmp_path / "run2")],
        )
    with pytest.raises(SystemExit, match="--views is not supported"):
        run_training(
            lambda h, w, data_dir=None: prepare_synthetic_data(h, w),
            str(cfg_path), default_eval_every=5,
            argv=["--config", str(cfg_path), "--views", "16",
                  "--run-dir", str(tmp_path / "run3")],
        )


def test_epoch_unit_schedules_resolve_through_cli(tmp_path, capsys):
    """LR_DECAY_EPOCHS / PROP_ANNEAL_EPOCHS convert to optimizer steps
    once the CLI knows steps-per-epoch (the long-run pinned-schedule
    recipe, docs/evidence/long_horizon_quality.json): the trainer's
    config carries the step-unit horizons and the epoch fields are
    zeroed so the resolved config stays re-validatable."""
    import re

    import train_synthetic
    from nerf_keras_tpu.cli.train import run_training

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "BATCH_SIZE": 128, "NS_COARSE": 4, "NS_FINE": 8,
        "HEIGHT": 12, "WIDTH": 12, "L_XYZ": 4, "L_DIR": 2,
        "NUM_LAYERS": 2, "HIDDEN_DIM": 16, "SKIP_LAYER": 4, "EPOCHS": 2,
        "LEARNING_RATE": 0.002, "BATCH_NORM": False, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32", "EVAL_EVERY": 2,
        "TRAIN_SAMPLER": "proposal",
        "LR_FINAL": 2e-4, "LR_DECAY_EPOCHS": 3, "PROP_ANNEAL_EPOCHS": 2,
    }))
    trainer = run_training(
        train_synthetic.prepare, str(cfg_path), default_eval_every=1,
        argv=["--config", str(cfg_path),
              "--run-dir", str(tmp_path / "run")],
    )
    out = capsys.readouterr().out
    n_train = int(re.search(r"train=(\d+)", out).group(1))
    steps_per_epoch = n_train // 128
    assert trainer.cfg.lr_decay_steps == 3 * steps_per_epoch
    assert trainer.cfg.prop_anneal_steps == 2 * steps_per_epoch
    assert trainer.cfg.lr_decay_epochs == 0
    assert trainer.cfg.prop_anneal_epochs == 0
    trainer.cfg.validate()  # resolved config has one horizon unit again


def test_few_view_collapse_detection():
    """Replay of the MEASURED spheres seed-23 collapse (val stuck ~11 dB
    under a climbing train curve, docs/evidence/spheres_scene_quality
    .json) fires the signature; healthy and late-decay curves do not."""
    from nerf_keras_tpu.utils.metrics import History

    def replay(val_evals, train_start, train_end, eval_every=10):
        h = History()
        n_epochs = len(val_evals) * eval_every
        for e in range(n_epochs):
            train_psnr = train_start + (train_end - train_start) * e / n_epochs
            m = {"loss_coarse": 0.1, "loss": 0.1, "psnr": train_psnr}
            if (e + 1) % eval_every == 0:
                v = val_evals[(e + 1) // eval_every - 1]
                h.append(m, {"loss": 0.1, "psnr": v})
            else:
                h.append(m)
        return h

    # the real seed-23 12-view collapse curve (coarse arm)
    collapsed = replay([10.88, 11.22, 11.32, 11.4, 11.43, 11.48, 11.5,
                        11.55], 12.0, 24.0)
    assert collapsed.few_view_collapse()

    # healthy run (same scene, seed 42): val rises with train
    healthy = replay([11.34, 14.85, 18.08, 19.44, 20.07, 20.35, 20.54,
                      20.67], 12.0, 24.0)
    assert not healthy.few_view_collapse()

    # late decay from a healthy peak: NOT this signature (val is neither
    # low-flat under the ceiling for the window, nor train-driven)
    decay = replay([12.0, 20.0, 25.0, 24.0, 22.0, 20.0, 18.0, 16.0],
                   12.0, 30.0)
    assert not decay.few_view_collapse()

    # flat val because training is flat too (converged tiny run): quiet
    converged = replay([11.0, 11.2, 11.3, 11.3, 11.3, 11.3, 11.3, 11.3],
                       11.0, 11.5)
    assert not converged.few_view_collapse()

    # too little history: quiet
    assert not History().few_view_collapse()


def test_real_data_kit_dry_run(tmp_path):
    """The real-data readiness kit (round-5; closure plan for the two
    env-blocked gaps) must be known-good TODAY: every stage runs against
    local fixtures through the same code paths the real run will use.
    The slow reference-control parity stage is exercised by the kit's
    manual dry run (docs/evidence/real_data_readiness_dryrun.json);
    here we pin the other four stages end to end."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "evidence"
    tiny_cfg = tmp_path / "fern_tiny.json"
    tiny_cfg.write_text(json.dumps({
        "BATCH_SIZE": 128, "TEST_BATCH_SIZE": 64, "NS_COARSE": 8,
        "NS_FINE": 8, "HEIGHT": 12, "WIDTH": 16, "L_XYZ": 4, "L_DIR": 2,
        "NUM_LAYERS": 4, "HIDDEN_DIM": 32, "SKIP_LAYER": 4, "EPOCHS": 4,
        "LEARNING_RATE": 0.002, "BATCH_NORM": False, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32",
    }))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "real_data_kit.py"),
         "--dry-run", "--skip-parity", "--epochs", "4",
         "--fern-config", str(tiny_cfg),
         "--dest", str(tmp_path / "data"), "--out", str(out)],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads((out / "real_data_readiness_dryrun.json").read_text())
    assert rep["dry_run"] is True
    stages = rep["stages"]
    assert set(stages) == {"fetch_lego", "fetch_fern", "fern_smoke",
                           "gcs_roundtrip"}
    assert stages["gcs_roundtrip"]["ok"] is True
    assert len(stages["fetch_lego"]["sha256"]) == 64
    assert np.isfinite(stages["fern_smoke"]["val_psnr"])
