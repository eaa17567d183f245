"""Train/eval step behavior: loss decreases, metrics match the reference's
definitions, BatchNorm state threads, forward pass honors shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_keras_tpu.config import NeRFConfig
from nerf_keras_tpu.engine.step import (
    init_train_state,
    make_eval_step,
    make_forward_pass,
    make_train_step,
    mse,
    psnr,
)

CFG = NeRFConfig(
    batch_size=32,
    ns_coarse=8,
    ns_fine=16,
    num_layers=3,
    hidden_dim=32,
    compute_dtype="float32",
)


def _fake_batch(key, n=32):
    k1, k2 = jax.random.split(key)
    images = jax.random.uniform(k1, (n, 3))
    dirs = jax.random.normal(k2, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.zeros((n, 3)) + jnp.asarray([0.0, 0.0, 4.0])
    return images, origins, dirs


def test_psnr_definition():
    a = jnp.zeros((4, 3))
    b = jnp.full((4, 3), 0.1)
    np.testing.assert_allclose(float(psnr(a, b)), -10 * np.log10(0.01), rtol=1e-4)
    np.testing.assert_allclose(float(mse(a, b)), 0.01, rtol=1e-6)


def test_forward_pass_shapes():
    fwd = make_forward_pass(CFG)
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    images, origins, dirs = _fake_batch(jax.random.PRNGKey(1))
    t = jnp.broadcast_to(jnp.linspace(2.0, 6.0, CFG.ns_coarse), (32, CFG.ns_coarse))
    outputs, new_bn = fwd(
        state.params, state.bn, jax.random.PRNGKey(2), origins, dirs, t, False
    )
    (rgb_c, rgb_f), (d_c, d_f), (w_c, w_f), (p_c, p_f) = outputs
    assert rgb_c.shape == (32, 3) and rgb_f.shape == (32, 3)
    assert d_c.shape == (32,) and d_f.shape == (32,)
    assert w_c.shape == (32, CFG.ns_coarse)
    assert w_f.shape == (32, CFG.ns_coarse + CFG.ns_fine)
    assert p_f.shape == (32, CFG.ns_coarse + CFG.ns_fine, 4)
    assert new_bn is None


def test_train_step_decreases_loss():
    step = jax.jit(make_train_step(CFG, 2.0, 6.0))
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    batch = _fake_batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(42)
    first = None
    for _ in range(60):
        state, metrics = step(state, batch, key)
        if first is None:
            first = float(metrics["loss"] + metrics["loss_coarse"])
    last = float(metrics["loss"] + metrics["loss_coarse"])
    assert last < first * 0.7, (first, last)
    assert int(state.step) == 60
    assert np.isfinite(float(metrics["psnr"]))


def test_train_step_randomness_differs_per_step():
    """t-value jitter must differ step to step (the reference's is frozen
    per dataset — our improvement must actually be live)."""
    cfg = CFG
    step = jax.jit(make_train_step(cfg, 2.0, 6.0))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _fake_batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(0)
    state1, m1 = step(state, batch, key)
    # same params/batch/key but step counter advanced -> different jitter.
    # (Probe the coarse loss: the tiny fine MLP can initialize with an
    # all-negative sigma head, making rgb_fine identically zero.)
    state2, m2 = step(state1._replace(params=state.params, opt_state=state.opt_state), batch, key)
    assert float(m1["loss_coarse"]) != float(m2["loss_coarse"])


def test_eval_step_deterministic():
    cfg = CFG
    estep = jax.jit(make_eval_step(cfg, 2.0, 6.0))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _fake_batch(jax.random.PRNGKey(1))
    a = estep(state, batch)
    b = estep(state, batch)
    assert float(a["loss"]) == float(b["loss"])
    assert float(a["psnr"]) == float(b["psnr"])


def test_batchnorm_state_updates_in_training():
    cfg = NeRFConfig(
        batch_size=16, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16,
        batch_norm=True, compute_dtype="float32",
    )
    step = jax.jit(make_train_step(cfg, 2.0, 6.0))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    assert state.bn is not None
    batch = _fake_batch(jax.random.PRNGKey(1), n=16)
    new_state, _ = step(state, batch, jax.random.PRNGKey(2))
    before = np.asarray(state.bn["coarse"]["trunk"][0]["mean"])
    after = np.asarray(new_state.bn["coarse"]["trunk"][0]["mean"])
    assert not np.allclose(before, after)


def test_shared_sampling_mode_runs():
    cfg = NeRFConfig(
        batch_size=8, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16,
        sampling_mode="shared", compute_dtype="float32",
    )
    step = jax.jit(make_train_step(cfg, 2.0, 6.0))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = _fake_batch(jax.random.PRNGKey(1), n=8)
    _, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_step_timer_and_annotate():
    """Profiling harness: StepTimer measures a jitted step; annotate works."""
    import jax.numpy as jnp
    from nerf_keras_tpu.utils.profiling import StepTimer, annotate

    f = jax.jit(lambda x: jnp.sum(x * 2.0))
    x = jnp.ones((128,))
    with annotate("test-span"):
        stats = StepTimer(warmup=1, steps=3).measure(lambda: f(x))
    assert stats["step_ms"] > 0
    assert stats["steps_per_sec"] > 0


def test_resume_is_exact(tmp_path):
    """Checkpoint -> restore -> continue must reproduce the continuous
    run exactly: randomness is derived from fold_in(key, state.step), and
    the checkpoint carries params + optimizer moments + step."""
    import numpy as np
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import init_train_state, make_train_step
    from nerf_keras_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = NeRFConfig(
        batch_size=32, ns_coarse=4, ns_fine=8, num_layers=2, hidden_dim=16,
        compute_dtype="float32",
    ).validate()
    step = jax.jit(make_train_step(cfg, 2.0, 6.0))
    key = jax.random.PRNGKey(7)

    rng = np.random.default_rng(0)
    batches = []
    for i in range(6):
        images = rng.uniform(0, 1, (32, 3)).astype(np.float32)
        dirs = rng.normal(size=(32, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        origins = np.tile(np.array([0, 0, 4.0], np.float32), (32, 1))
        batches.append((jnp.asarray(images), jnp.asarray(origins), jnp.asarray(dirs)))

    # continuous run: 6 steps
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    losses_cont = []
    for b in batches:
        state, m = step(state, b, key)
        losses_cont.append(float(m["loss"]))

    # interrupted run: 3 steps, checkpoint, restore, 3 more
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    for b in batches[:3]:
        state, m = step(state, b, key)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, jax.device_get(state))
    losses_resumed = []
    for b in batches[3:]:
        restored, m = step(restored, b, key)
        losses_resumed.append(float(m["loss"]))

    np.testing.assert_allclose(losses_resumed, losses_cont[3:], rtol=1e-6)


def test_stop_pdf_gradient_isolates_coarse():
    """With stop_pdf_gradient (default) the coarse params' gradient comes
    only from the coarse MSE — gradients must NOT flow through the fine
    pass's importance sampling; with the reference-faithful mode they do."""
    import numpy as np
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import init_train_state, make_forward_pass

    kwargs = dict(batch_size=16, ns_coarse=4, ns_fine=8, num_layers=2,
                  hidden_dim=16, compute_dtype="float32")
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(16, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (16, 1))
    t_vals = np.broadcast_to(
        np.linspace(2.0, 6.0, 4, dtype=np.float32), (16, 4)
    ).copy()
    key = jax.random.PRNGKey(0)

    def fine_loss_grad_on_coarse(stop):
        cfg = NeRFConfig(stop_pdf_gradient=stop, **kwargs).validate()
        forward = make_forward_pass(cfg)
        state = init_train_state(jax.random.PRNGKey(1), cfg)

        def fine_only_loss(params):
            outputs, _ = forward(params, None, key, origins, dirs, t_vals, True)
            (_, rgb_fine) = outputs[0]
            return jnp.sum(rgb_fine**2)

        g = jax.grad(fine_only_loss)(state.params)
        return max(
            float(jnp.max(jnp.abs(leaf)))
            for leaf in jax.tree_util.tree_leaves(g["coarse"])
        )

    assert fine_loss_grad_on_coarse(True) == 0.0
    assert fine_loss_grad_on_coarse(False) > 0.0


def test_ns_fine_zero_coarse_only_training():
    """ns_fine=0 degrades to coarse-only NeRF (no importance sampling)."""
    import numpy as np
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import init_train_state, make_train_step

    cfg = NeRFConfig(
        batch_size=8, ns_coarse=4, ns_fine=0, num_layers=2, hidden_dim=16,
        compute_dtype="float32",
    ).validate()
    step = jax.jit(make_train_step(cfg, 2.0, 6.0))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (8, 3)).astype(np.float32)
    d = rng.normal(size=(8, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.array([0, 0, 4.0], np.float32), (8, 1))
    _, m = step(state, (img, o, d), jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_profiler_trace_writes_artifacts(tmp_path):
    """utils.profiling.trace captures a TensorBoard-loadable trace dir."""
    import os
    from nerf_keras_tpu.utils.profiling import trace

    d = str(tmp_path / "trace")
    with trace(d):
        jax.jit(lambda x: x * 2.0)(jnp.ones((64,))).block_until_ready()
    found = []
    for root, _, files in os.walk(d):
        found += files
    assert found, "no trace files written"


def test_train_cli_profile_flag(tmp_path):
    """--profile wraps the first --profile-steps train steps in a
    jax.profiler trace and the epoch still completes with merged metrics
    (head/tail step-weighted mean) — the CLI surface for the SURVEY §5
    tracing row."""
    import json
    import os

    import train_synthetic
    from nerf_keras_tpu.cli.train import run_training

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "BATCH_SIZE": 128, "NS_COARSE": 4, "NS_FINE": 8,
        "HEIGHT": 12, "WIDTH": 12, "L_XYZ": 4, "L_DIR": 2,
        "NUM_LAYERS": 2, "HIDDEN_DIM": 16, "SKIP_LAYER": 4, "EPOCHS": 1,
        "LEARNING_RATE": 0.002, "BATCH_NORM": False, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32", "EVAL_EVERY": 1,
    }))
    run_dir = tmp_path / "run"
    trace_dir = tmp_path / "trace"
    trainer = run_training(
        train_synthetic.prepare, str(cfg_path), default_eval_every=1,
        argv=["--config", str(cfg_path), "--run-dir", str(run_dir),
              "--profile", str(trace_dir), "--profile-steps", "3"],
    )
    found = []
    for root, _, files in os.walk(str(trace_dir)):
        found += files
    assert found, "no trace files written by --profile"
    # the profiled head (3 steps) + tail finished the full epoch
    steps_per_epoch = len(
        json.load(open(run_dir / "history_l2_d16_n12_ep1.json"))["losses"]
    )
    assert steps_per_epoch == 1  # one epoch recorded
    assert int(trainer.state.step) > 3  # tail ran outside the trace


def test_render_rays_full_outputs():
    """render_rays exposes compositing weights and raw MLP predictions —
    the reference's 8-tensor minibatched return (models.py:216-223)."""
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh

    cfg = NeRFConfig(
        batch_size=16, ns_coarse=4, ns_fine=8, num_layers=2, hidden_dim=16,
        compute_dtype="float32", use_pallas=False,
    ).validate()
    t = Trainer(cfg, 2.0, 6.0, mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    rng = np.random.default_rng(0)
    n = 24
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (n, 1))

    out = t.render_rays(origins, dirs, chunk=16, full=True)
    ns_total = cfg.ns_coarse + cfg.ns_fine
    assert out["weights_coarse"].shape == (n, cfg.ns_coarse)
    assert out["weights_fine"].shape == (n, ns_total)
    assert out["preds_coarse"].shape == (n, cfg.ns_coarse, 4)
    assert out["preds_fine"].shape == (n, ns_total, 4)
    # weights are a partial transmittance budget: nonneg, sum <= 1 + eps
    assert (out["weights_fine"] >= 0).all()
    assert (out["weights_fine"].sum(-1) <= 1.0 + 1e-4).all()

    # requesting a weights_* key implies the full render path
    out2 = t.render_rays(origins, dirs, chunk=16, keys=("weights_fine",))
    np.testing.assert_allclose(out2["weights_fine"], out["weights_fine"],
                               rtol=1e-5, atol=1e-6)
    assert set(out2) == {"weights_fine"}

    # slim path (default) stays slim
    out3 = t.render_rays(origins, dirs, chunk=16)
    assert set(out3) == {"rgb_coarse", "rgb_fine", "depth_coarse", "depth_fine"}


def test_checkpoint_scene_sidecar(tmp_path):
    """Sidecar round-trips scene geometry so inference recovers near/far/
    focal without flags (non-Lego checkpoints render correctly untold)."""
    from nerf_keras_tpu.utils.checkpoint import (
        load_checkpoint_config,
        load_checkpoint_scene,
        save_checkpoint,
    )

    cfg = NeRFConfig(
        batch_size=16, ns_coarse=4, ns_fine=8, num_layers=2, hidden_dim=16,
        compute_dtype="float32",
    ).validate()
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "c.ckpt.npz")
    save_checkpoint(path, state, cfg,
                    scene={"near": 0.9, "far": 5.5, "focal": 321.5})
    scene = load_checkpoint_scene(path)
    assert scene == {"near": 0.9, "far": 5.5, "focal": 321.5}
    # config load ignores the SCENE block
    assert load_checkpoint_config(path).batch_size == 16

    # checkpoints without a scene block (round-1 format) return None
    path2 = str(tmp_path / "old.ckpt.npz")
    save_checkpoint(path2, state, cfg)
    assert load_checkpoint_scene(path2) is None


def test_sorted_union_matches_sort():
    from nerf_keras_tpu.ops import sorted_union

    rng = np.random.default_rng(0)
    a = np.sort(rng.uniform(2, 6, (5, 8)).astype(np.float32), axis=-1)
    b = rng.uniform(2, 6, (5, 16)).astype(np.float32)
    got = np.asarray(sorted_union(jnp.asarray(a), jnp.asarray(b)))
    want = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
    np.testing.assert_array_equal(got, want)


def test_render_image_matches_include_coarse_path():
    """Both render_image modes (fine-only keys vs include_coarse) must
    agree on the fine maps, including with a chunk that pads."""
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh

    cfg = NeRFConfig(
        batch_size=16, ns_coarse=4, ns_fine=8, num_layers=2, hidden_dim=16,
        compute_dtype="float32", use_pallas=False,
    ).validate()
    t = Trainer(cfg, 2.0, 6.0, mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    h, w = 12, 10  # 120 rays, chunk 32 -> padding exercised
    fast = t.render_image(pose, h, w, focal=12.0, chunk=32)
    slow = t.render_image(pose, h, w, focal=12.0, chunk=32, include_coarse=True)
    assert "rgb_coarse" in slow and "rgb_coarse" not in fast
    np.testing.assert_allclose(fast["rgb"], slow["rgb"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fast["depth"], slow["depth"], rtol=1e-5, atol=1e-6)


def test_train_epoch_log_every(capsys):
    """LOG_EVERY prints per-step metrics (the config knob is consumed)."""
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh

    cfg = NeRFConfig(
        batch_size=16, ns_coarse=4, ns_fine=8, num_layers=2, hidden_dim=16,
        compute_dtype="float32", use_pallas=False,
    ).validate()
    t = Trainer(cfg, 2.0, 6.0, mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    batches = [
        tuple(np.asarray(x) for x in _fake_batch(jax.random.PRNGKey(i), 16))
        for i in range(4)
    ]
    t.train_epoch(iter(batches), log_every=2)
    out = capsys.readouterr().out
    assert out.count("step ") == 2  # steps 2 and 4
    assert "loss=" in out and "psnr=" in out


def test_train_epoch_returns_per_step_means():
    """Epoch metrics are the mean of the per-step metrics (the lazy
    device-side accumulation must not change the reported numbers)."""
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh

    cfg = NeRFConfig(
        batch_size=16, ns_coarse=4, ns_fine=8, num_layers=2, hidden_dim=16,
        compute_dtype="float32", use_pallas=False,
    ).validate()
    batches = [
        tuple(np.asarray(x) for x in _fake_batch(jax.random.PRNGKey(i), 16))
        for i in range(3)
    ]
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    # Reference arm: same seed, same fixed key -> identical step sequence,
    # metrics collected one step at a time.
    ref = Trainer(cfg, 2.0, 6.0, mesh=mesh)
    key = jax.random.PRNGKey(99)
    per_step = [ref.train_step(ref.put_batch(b), key) for b in batches]
    want = {
        k: float(np.mean([float(m[k]) for m in per_step]))
        for k in per_step[0]
    }
    got = Trainer(cfg, 2.0, 6.0, mesh=mesh).train_epoch(iter(batches), key)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6)


def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    """Preemption safety: SIGTERM mid-run must checkpoint at the next
    epoch boundary and exit 0 (the reference loses the run)."""
    import json
    import os
    import signal as _signal
    import subprocess
    import sys
    import time as _time

    cfg = {
        "BATCH_SIZE": 64, "NS_COARSE": 4, "NS_FINE": 8, "HEIGHT": 12,
        "WIDTH": 12, "L_XYZ": 4, "L_DIR": 2, "NUM_LAYERS": 2,
        "HIDDEN_DIM": 16, "SKIP_LAYER": 1, "EPOCHS": 500,
        "LEARNING_RATE": 0.002, "BATCH_NORM": False, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32", "EVAL_EVERY": 1000,
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    run_dir = tmp_path / "run"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no need for 8 virtual devices here
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "train_synthetic.py"),
         "--config", str(cfg_path), "--run-dir", str(run_dir),
         "--platform", "cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=repo, env=env,
    )
    # wait for training to actually be in the epoch loop
    deadline = _time.time() + 180
    lines = []
    for line in proc.stdout:
        lines.append(line)
        if line.startswith("epoch 2/"):
            break
        assert _time.time() < deadline, "".join(lines)
    proc.send_signal(_signal.SIGTERM)
    out = proc.stdout.read()
    rc = proc.wait(timeout=120)
    assert rc == 0, out
    assert "checkpoint saved" in out, out
    ckpts = list(run_dir.glob("*.ckpt.npz"))
    assert ckpts, out


def test_render_rays_staged_matches_per_chunk():
    """The staged (single-upload, device-side slicing) render path must
    be output-identical to the default per-chunk path, including with
    padding and a >1-device data mesh."""
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh

    cfg = NeRFConfig(
        batch_size=16, ns_coarse=4, ns_fine=8, num_layers=2, hidden_dim=16,
        compute_dtype="float32", use_pallas=False,
    ).validate()
    t = Trainer(cfg, 2.0, 6.0, mesh=make_mesh(8, 1))
    rng = np.random.default_rng(4)
    n = 100  # chunk 32 -> 4 chunks, last one padded
    o = np.tile(np.array([0, 0, 4.0], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    a = t.render_rays(o, d, chunk=32, staged=False)
    b = t.render_rays(o, d, chunk=32, staged=True)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6)


def test_render_image_ndc_branch():
    """An NDC-config Trainer converts pose rays to NDC in render_image:
    outputs are finite and match manually NDC-converted render_rays."""
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.ops.rays import get_rays, ndc_rays
    from nerf_keras_tpu.parallel.mesh import make_mesh

    cfg = NeRFConfig(
        batch_size=16, ns_coarse=4, ns_fine=8, num_layers=2, hidden_dim=16,
        compute_dtype="float32", use_pallas=False, ndc=True,
    ).validate()
    t = Trainer(cfg, 0.0, 1.0, mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    h, w, focal = 8, 10, 12.0
    out = t.render_image(pose, h, w, focal=focal, chunk=32)
    assert out["rgb"].shape == (h, w, 3) and np.isfinite(out["rgb"]).all()
    assert np.isfinite(out["depth"]).all()

    o, d = get_rays(h, w, focal, pose)
    o, d = ndc_rays(h, w, focal, 1.0, o, d)
    ref = t.render_rays(
        np.asarray(o).reshape(-1, 3), np.asarray(d).reshape(-1, 3), chunk=32
    )
    np.testing.assert_allclose(
        out["rgb"], ref["rgb_fine"].reshape(h, w, 3), rtol=1e-5, atol=1e-6
    )


def test_latest_checkpoint_natural_sort(tmp_path):
    """ep10 must beat ep2 (lexicographic sort served a 2-epoch model as
    'newest' — round-3 review finding)."""
    from nerf_keras_tpu.utils.checkpoint import latest_checkpoint

    for name in ("nerf_l8_d256_n192_ep2.ckpt.npz",
                 "nerf_l8_d256_n192_ep10.ckpt.npz"):
        (tmp_path / name).write_bytes(b"x")
    got = latest_checkpoint(str(tmp_path))
    assert got.endswith("ep10.ckpt.npz")


def test_save_checkpoint_atomic_no_tmp_residue(tmp_path):
    """Checkpoint saves go through temp+rename: repeated saves to the
    SAME path leave no .tmp residue and the file stays loadable."""
    from nerf_keras_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    cfg = NeRFConfig(
        batch_size=8, ns_coarse=2, ns_fine=2, num_layers=2, hidden_dim=8,
        l_xyz=2, l_dir=1, compute_dtype="float32",
    ).validate()
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "c.ckpt.npz")
    for _ in range(2):
        save_checkpoint(path, state, cfg, scene={"near": 1.0, "far": 2.0,
                                                 "ndc": True})
    assert not [p for p in tmp_path.iterdir() if p.name.endswith(".tmp")]
    restored = load_checkpoint(
        path, init_train_state(jax.random.PRNGKey(1), cfg)
    )
    np.testing.assert_array_equal(
        np.asarray(state.params["fine"]["trunk"][0]["w"]),
        np.asarray(restored.params["fine"]["trunk"][0]["w"]),
    )
    from nerf_keras_tpu.utils.checkpoint import load_checkpoint_scene

    scene = load_checkpoint_scene(path)
    assert scene["ndc"] is True  # bools survive the sidecar round-trip


def test_trainer_restore_roundtrip(tmp_path):
    """Trainer.restore owns the restore invariant used by resume/serving/
    inference."""
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh
    from nerf_keras_tpu.utils.checkpoint import save_checkpoint

    cfg = NeRFConfig(
        batch_size=16, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16,
        compute_dtype="float32", use_pallas=False,
    ).validate()
    t1 = Trainer(cfg, 2.0, 6.0, mesh=make_mesh(8, 1))
    path = str(tmp_path / "t.ckpt.npz")
    save_checkpoint(path, t1.state, cfg)
    t2 = Trainer(cfg, 2.0, 6.0, mesh=make_mesh(8, 1), seed=123).restore(path)
    np.testing.assert_array_equal(
        np.asarray(t1.state.params["coarse"]["trunk"][0]["w"]),
        np.asarray(t2.state.params["coarse"]["trunk"][0]["w"]),
    )


# ---------------------------------------------------------------------------
# LR schedule + EMA (beyond-reference training-quality knobs; the reference
# trains at a constant Keras-default LR and evals the raw online params,
# train_lego.py:149 / models.py:88-120)
# ---------------------------------------------------------------------------


def test_lr_schedule_decays_to_floor():
    """LR_FINAL enables exponential decay from LEARNING_RATE to LR_FINAL
    over LR_DECAY_STEPS, then holds the floor; the schedule lives inside
    the optimizer so resume continues it from Adam's own step count."""
    import dataclasses

    import optax

    cfg = dataclasses.replace(
        CFG, learning_rate=1e-3, lr_final=1e-5, lr_decay_steps=100
    ).validate()
    sched = optax.exponential_decay(
        init_value=1e-3, transition_steps=100, decay_rate=1e-2,
        end_value=1e-5,
    )
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(100)), 1e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(500)), 1e-5, rtol=1e-6)  # floor

    # The scheduled optimizer's step size shrinks with the count while the
    # constant one's doesn't: apply identical grads at count 0 and count 99.
    from nerf_keras_tpu.engine.step import make_optimizer

    opt = make_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.5)}
    st = opt.init(params)
    up0, st = opt.update(grads, st, params)
    for _ in range(99):
        _, st = opt.update(grads, st, params)
    up99, _ = opt.update(grads, st, params)
    ratio = float(jnp.abs(up99["w"]).mean() / jnp.abs(up0["w"]).mean())
    assert ratio < 0.05, ratio  # ~1e-2 up to Adam moment drift

    # Unresolved horizon must raise, not silently train constant.
    bad = dataclasses.replace(cfg, lr_decay_steps=0)
    with pytest.raises(ValueError, match="LR_DECAY_STEPS"):
        make_optimizer(bad)


def _ema_cfg():
    import dataclasses

    return dataclasses.replace(
        CFG, batch_size=16, ema_decay=0.9, use_pallas=False
    ).validate()


def test_ema_recurrence_and_eval_routing():
    """state.ema follows ema = d*ema + (1-d)*params exactly, and ALL
    eval/render paths consume the EMA shadow, not the online params."""
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh

    cfg = _ema_cfg()
    tr = Trainer(cfg, 2.0, 6.0, mesh=make_mesh(8, 1))
    assert tr.state.ema is not None
    batch = _fake_batch(jax.random.PRNGKey(3), n=16)

    p0 = jax.device_get(tr.state.params)
    # EMA starts as a copy of the initial params (valid model at step 0).
    np.testing.assert_array_equal(
        np.asarray(p0["fine"]["trunk"][0]["w"]),
        np.asarray(tr.state.ema["fine"]["trunk"][0]["w"]),
    )
    tr.train_step(tr.put_batch(batch))
    p1 = jax.device_get(tr.state.params)
    ref = jax.tree_util.tree_map(lambda a, b: 0.9 * a + 0.1 * b, p0, p1)
    err = max(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                ref,
                jax.device_get(tr.state.ema),
            )
        )
    )
    assert err < 1e-6, err

    # eval_step and render_rays must ride the EMA: zeroing the shadow
    # changes their outputs even though the online params are untouched.
    ev1 = float(tr.eval_step(tr.put_global_batch(batch))["loss"])
    r1 = tr.render_rays(
        np.asarray(batch[1]), np.asarray(batch[2]), chunk=16,
        keys=("rgb_fine",),
    )["rgb_fine"]
    zeros = jax.tree_util.tree_map(jnp.zeros_like, tr.state.ema)
    tr.state = tr.state._replace(ema=zeros)
    ev2 = float(tr.eval_step(tr.put_global_batch(batch))["loss"])
    r2 = tr.render_rays(
        np.asarray(batch[1]), np.asarray(batch[2]), chunk=16,
        keys=("rgb_fine",),
    )["rgb_fine"]
    assert ev1 != ev2
    assert np.abs(r1 - r2).max() > 0


def test_ema_checkpoint_roundtrip_and_pre_ema_fallback(tmp_path):
    """The EMA shadow is checkpointed with the state; resuming a PRE-EMA
    checkpoint with EMA_DECAY newly enabled seeds the shadow from the
    stored params instead of failing."""
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh
    from nerf_keras_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = _ema_cfg()
    tr = Trainer(cfg, 2.0, 6.0, mesh=make_mesh(8, 1))
    tr.train_step(tr.put_batch(_fake_batch(jax.random.PRNGKey(3), n=16)))
    path = str(tmp_path / "s.ckpt.npz")
    save_checkpoint(path, tr.state, cfg)

    tr2 = Trainer(cfg, 2.0, 6.0, mesh=make_mesh(8, 1), seed=7).restore(path)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(tr.state.ema["fine"]["trunk"][0]["w"])),
        np.asarray(jax.device_get(tr2.state.ema["fine"]["trunk"][0]["w"])),
    )

    # Strip the .ema leaves to simulate a checkpoint from before the
    # feature existed.
    data = dict(np.load(path))
    old = {k: v for k, v in data.items() if not k.startswith(".ema")}
    path_old = str(tmp_path / "old.ckpt.npz")
    np.savez(path_old, **old)
    st = load_checkpoint(path_old, jax.device_get(tr.state))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        st.ema, st.params,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_ema_replace_params_resets_shadow():
    """Installing external weights resets the EMA shadow to them —
    averaging across unrelated weights would serve a nonsense model."""
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh

    cfg = _ema_cfg()
    tr = Trainer(cfg, 2.0, 6.0, mesh=make_mesh(8, 1))
    for _ in range(3):
        tr.train_step(tr.put_batch(_fake_batch(jax.random.PRNGKey(3), n=16)))
    new = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.ones_like(np.asarray(x))),
        jax.device_get(tr.state.params),
    )
    tr.replace_params(new)
    np.testing.assert_array_equal(
        np.asarray(tr.state.ema["fine"]["trunk"][0]["w"]),
        np.asarray(tr.state.params["fine"]["trunk"][0]["w"]),
    )


def test_ema_with_online_proposal_state():
    """EMA composes with TRAIN_SAMPLER='proposal' ({'proposal','fine'}
    params): the shadow covers the proposal net too, so eval/serving see
    a consistently averaged sampler+field pair."""
    import dataclasses

    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh

    cfg = dataclasses.replace(
        _ema_cfg(), train_sampler="proposal", prop_l_xyz=2, prop_hidden=8,
        prop_depth=2,
    ).validate()
    tr = Trainer(cfg, 2.0, 6.0, mesh=make_mesh(8, 1))
    assert set(tr.state.ema) == {"proposal", "fine"}
    batch = _fake_batch(jax.random.PRNGKey(5), n=16)
    p0 = jax.device_get(tr.state.params)
    tr.train_step(tr.put_batch(batch))
    p1 = jax.device_get(tr.state.params)
    ref = jax.tree_util.tree_map(lambda a, b: 0.9 * a + 0.1 * b, p0, p1)
    err = max(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                ref,
                jax.device_get(tr.state.ema),
            )
        )
    )
    assert err < 1e-6, err
    float(tr.eval_step(tr.put_global_batch(batch))["psnr"])  # compiles+runs


def test_distortion_loss_trains_and_compacts_weights():
    """DISTORTION_LOSS_MULT wires into the XLA train step (parity and
    proposal modes): loss stays finite/decreasing and the regularizer
    measurably compacts the fine compositing weights vs the unregularized
    control after identical schedules."""
    import dataclasses

    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.ops import distortion_loss
    from nerf_keras_tpu.parallel.mesh import make_mesh

    base = dataclasses.replace(
        CFG, batch_size=64, use_pallas=False
    ).validate()
    reg = dataclasses.replace(base, distortion_loss_mult=0.05).validate()
    batch = _fake_batch(jax.random.PRNGKey(9), n=64)

    def run(cfg):
        tr = Trainer(cfg, 2.0, 6.0, mesh=make_mesh(8, 1))
        for _ in range(30):
            m = tr.train_step(tr.put_batch(batch))
        out = tr.render_rays(
            np.asarray(batch[1]), np.asarray(batch[2]), chunk=64,
            keys=("weights_fine",), full=True,
        )
        return float(m["loss"]), out["weights_fine"]

    loss_b, w_b = run(base)
    loss_r, w_r = run(reg)
    assert np.isfinite(loss_b) and np.isfinite(loss_r)
    # Compare the distortion statistic itself on equal-shape weights.
    S = w_b.shape[-1]
    t = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), w_b.shape)
    d_b = float(distortion_loss(t, jnp.asarray(w_b), 2.0, 6.0))
    d_r = float(distortion_loss(t, jnp.asarray(w_r), 2.0, 6.0))
    assert d_r < d_b, (d_r, d_b)


def test_distortion_allowed_on_pallas_path():
    """The fused megakernel supports the distortion regularizer via its
    weights-cotangent backward (render_rays_fused weights_grad) — the
    combination validates; step parity is pinned in
    tests/test_pallas.py::test_fused_train_step_with_distortion_matches_xla."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, distortion_loss_mult=0.01, use_pallas=True
    ).validate()
    assert cfg.distortion_loss_mult == 0.01 and cfg.use_pallas


def test_uint8_device_fetch_matches_host_conversion():
    """render_rays(uint8_rgb=True) must equal to_uint8(float fetch)
    bit-for-bit, and render_image(need_depth=False) must omit depth."""
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.ops.rays import pose_spherical
    from nerf_keras_tpu.utils.image import to_uint8

    trainer = Trainer(CFG, 2.0, 6.0)
    import numpy as np
    rng = np.random.default_rng(0)
    o = np.tile(np.array([0, 0, 4.0], np.float32), (40, 1))
    d = rng.normal(size=(40, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    f = trainer.render_rays(o, d, chunk=32, keys=("rgb_fine", "depth_fine"))
    u = trainer.render_rays(o, d, chunk=32, keys=("rgb_fine", "depth_fine"),
                            uint8_rgb=True)
    assert u["rgb_fine"].dtype == np.uint8
    np.testing.assert_array_equal(u["rgb_fine"], to_uint8(f["rgb_fine"]))
    # idempotence guard: double conversion must not re-scale
    np.testing.assert_array_equal(to_uint8(u["rgb_fine"]), u["rgb_fine"])
    # depth untouched by the rgb conversion
    np.testing.assert_allclose(u["depth_fine"], f["depth_fine"])

    img = trainer.render_image(pose_spherical(30.0, -30.0, 4.0), 8, 8,
                               focal=10.0, chunk=32, uint8_rgb=True,
                               need_depth=False)
    assert img["rgb"].dtype == np.uint8 and img["rgb"].shape == (8, 8, 3)
    assert "depth" not in img
