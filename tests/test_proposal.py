"""Proposal-sampler tests: distillation, weight semantics, trainer wiring.

The proposal sampler (ops/proposal.py) is beyond-reference: it replaces
the inference-time coarse MLP pass with a tiny density net distilled from
the trained fine model.  These tests run on the virtual 8-device CPU mesh
(trainer-level cases exercise the sharded render path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_keras_tpu.ops.proposal import (
    apply_proposal,
    distill_proposal,
    init_proposal,
    proposal_sigma,
    proposal_weights,
)
from nerf_keras_tpu.ops.volume import volume_render


def _blob_sigma(center, amp=20.0, width=0.4):
    """Analytic density: a gaussian blob -> raw sigma logits."""
    center = jnp.asarray(center, jnp.float32)

    def sigma_fn(pts):
        d2 = jnp.sum((pts - center) ** 2, axis=-1)
        return amp * jnp.exp(-d2 / (2.0 * width**2))

    return sigma_fn


def _rays_toward_origin(n=256, radius=4.0, seed=0):
    """Rays from a sphere of poses, all aimed at the origin."""
    rng = np.random.default_rng(seed)
    z = rng.uniform(-0.7, 0.7, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    r = np.sqrt(1 - z**2)
    dirs = -np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)
    origins = -radius * dirs
    return jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32)


def test_proposal_weights_match_volume_render():
    """proposal_weights must reuse the exact compositing semantics of
    ops/volume.py on the proposal's own density."""
    key = jax.random.PRNGKey(0)
    params = init_proposal(key, l_xyz=2, hidden=16, depth=2)
    o, d = _rays_toward_origin(8)
    t_vals = jnp.linspace(2.0, 6.0, 9)[None, :] * jnp.ones((8, 1))

    w = proposal_weights(params, o, d, t_vals, l_xyz=2)

    pts = o[:, None, :] + d[:, None, :] * t_vals[..., None]
    sigma = proposal_sigma(params, pts, l_xyz=2)
    preds = jnp.concatenate(
        [jnp.zeros(sigma.shape + (3,)), sigma[..., None]], -1
    )
    _, _, w_ref = volume_render(preds, t_vals)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-7)


def test_distill_learns_blob_placement():
    """Distilled against an analytic gaussian blob, the proposal's
    compositing weights must concentrate where the blob is: for rays
    aimed at the blob center from radius 4, peak weight near t=4."""
    sigma_fn = _blob_sigma([0.0, 0.0, 0.0])
    o, d = _rays_toward_origin(512)
    params, loss = distill_proposal(
        jax.random.PRNGKey(1), sigma_fn, o, d, 2.0, 6.0,
        l_xyz=4, hidden=32, depth=3, steps=300, batch=1024, lr=5e-3,
    )
    assert loss < 0.05, f"distillation failed to converge: {loss}"

    o_t, d_t = _rays_toward_origin(64, seed=9)
    t_vals = jnp.linspace(2.0, 6.0, 33)[None, :] * jnp.ones((64, 1))
    w = np.asarray(proposal_weights(params, o_t, d_t, t_vals, l_xyz=4))
    t_peak = np.asarray(t_vals)[np.arange(64), w.argmax(-1)]
    # Blob spans ~±0.8 around t=4 on center-aimed rays.
    assert np.abs(t_peak - 4.0).max() < 1.0
    # Mass concentrates: the blob interval holds the bulk of the weight.
    # Not ~1.0 by design — the asymmetric distillation loss biases toward
    # OVER-predicting density in empty space (a spread PDF wastes a few
    # fine samples; an under-predicted surface loses them), so some
    # weight leaks outside the blob.
    in_blob = (np.asarray(t_vals) > 3.0) & (np.asarray(t_vals) < 5.0)
    frac = (w * in_blob).sum(-1) / np.maximum(w.sum(-1), 1e-8)
    assert frac.mean() > 0.65


def test_distill_deterministic():
    sigma_fn = _blob_sigma([0.0, 0.0, 0.0])
    o, d = _rays_toward_origin(64)
    kw = dict(l_xyz=2, hidden=8, depth=2, steps=20, batch=64)
    p1, l1 = distill_proposal(jax.random.PRNGKey(3), sigma_fn, o, d, 2.0, 6.0, **kw)
    p2, l2 = distill_proposal(jax.random.PRNGKey(3), sigma_fn, o, d, 2.0, 6.0, **kw)
    assert l1 == l2
    for a, b in zip(p1["layers"], p2["layers"]):
        np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))


def test_apply_proposal_shapes():
    params = init_proposal(jax.random.PRNGKey(0), l_xyz=3, hidden=16, depth=3)
    x_enc = jnp.zeros((5, 7, 3 + 6 * 3))
    assert apply_proposal(params, x_enc).shape == (5, 7)
    sigma = proposal_sigma(params, jnp.zeros((11, 3)), l_xyz=3)
    assert sigma.shape == (11,)
    assert (np.asarray(sigma) >= 0).all()


# ---------------------------------------------------------------- trainer


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


def test_trainer_proposal_render_and_guards():
    """Trainer-level proposal path under the 8-device CPU mesh: close to
    the standard render, correct error paths, quant composition."""
    from nerf_keras_tpu.ops.rays import pose_spherical

    trainer, cfg = _tiny_trainer()
    pose = pose_spherical(30.0, -30.0, 4.0)
    o, d = trainer.pose_rays(pose, cfg.height, cfg.width, 10.0)

    with pytest.raises(RuntimeError, match="build_proposal_sampler"):
        trainer.render_rays(o, d, chunk=64, sampler="proposal")
    with pytest.raises(ValueError, match="sampler"):
        trainer.render_rays(o, d, chunk=64, sampler="grid")

    trainer.build_proposal_sampler(o, d, steps=120, batch=512)
    out_p = trainer.render_image(pose, cfg.height, cfg.width, 10.0,
                                 chunk=64, sampler="proposal")
    out_f = trainer.render_image(pose, cfg.height, cfg.width, 10.0, chunk=64)
    assert out_p["rgb"].shape == (cfg.height, cfg.width, 3)
    assert np.isfinite(out_p["rgb"]).all() and np.isfinite(out_p["depth"]).all()
    err = out_p["rgb"] - out_f["rgb"]
    assert np.sqrt(np.mean(err**2)) < 0.05

    with pytest.raises(ValueError, match="fine only"):
        trainer.render_rays(o, d, chunk=64, sampler="proposal", full=True)
    with pytest.raises(ValueError, match="no coarse outputs"):
        trainer.render_rays(o, d, chunk=64, sampler="proposal",
                            keys=("rgb_coarse",))
    with pytest.raises(ValueError, match="no coarse outputs"):
        trainer.render_image(pose, cfg.height, cfg.width, 10.0,
                             sampler="proposal", include_coarse=True)
    with pytest.raises(RuntimeError, match="quantize_for_inference"):
        trainer.render_rays(o, d, chunk=64, sampler="proposal", quant=True)

    trainer.quantize_for_inference(o, d)
    out_pq = trainer.render_image(pose, cfg.height, cfg.width, 10.0,
                                  chunk=64, sampler="proposal", quant=True)
    err_q = out_pq["rgb"] - out_p["rgb"]
    assert np.sqrt(np.mean(err_q**2)) < 0.05


def test_weight_change_invalidates_derived_state(tmp_path):
    """restore / replace_params / train_step install NEW weights; the
    int8 calibration and proposal distillation built from the OLD ones
    must not silently survive."""
    from nerf_keras_tpu.ops.rays import pose_spherical
    from nerf_keras_tpu.utils.checkpoint import save_checkpoint

    trainer, cfg = _tiny_trainer()
    pose = pose_spherical(30.0, -30.0, 4.0)
    o, d = trainer.pose_rays(pose, cfg.height, cfg.width, 10.0)
    ckpt = str(tmp_path / "model.ckpt.npz")
    save_checkpoint(ckpt, trainer.state, cfg)

    trainer.build_proposal_sampler(o, d, steps=10, batch=64)
    trainer.quantize_for_inference(o, d)
    trainer.render_rays(o, d, chunk=64, sampler="proposal", quant=True)

    trainer.restore(ckpt)
    with pytest.raises(RuntimeError, match="build_proposal_sampler"):
        trainer.render_rays(o, d, chunk=64, sampler="proposal")
    with pytest.raises(RuntimeError, match="quantize_for_inference"):
        trainer.render_rays(o, d, chunk=64, quant=True)

    trainer.build_proposal_sampler(o, d, steps=10, batch=64)
    batch = trainer.put_batch((
        np.zeros((cfg.batch_size, 3), np.float32),
        np.tile(np.float32([0, 0, 4.0]), (cfg.batch_size, 1)),
        np.tile(np.float32([0, 0, -1.0]), (cfg.batch_size, 1)),
    ))
    trainer.train_step(batch)
    with pytest.raises(RuntimeError, match="build_proposal_sampler"):
        trainer.render_rays(o, d, chunk=64, sampler="proposal")


def test_proposal_sampler_ndc_config():
    """NDC configs distill and render through the proposal sampler in the
    SAME space the fine model sees: pose_rays emits NDC rays and the
    distillation samples t ~ U(0, 1) along them — a world-space distill
    against an NDC-trained field would silently mis-place every sample."""
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer

    cfg = NeRFConfig(
        batch_size=16, ns_coarse=4, ns_fine=8, num_layers=2, hidden_dim=16,
        l_xyz=4, l_dir=2, compute_dtype="float32", ndc=True,
    ).validate()
    t = Trainer(cfg, 0.0, 1.0)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    o, d = t.pose_rays(pose, 8, 10, 12.0)
    # NDC rays: every origin is projected onto the z=-1 near plane
    # (world-space origins would all be the camera center [0, 0, 4]).
    np.testing.assert_allclose(np.asarray(o)[:, 2], -1.0, atol=1e-6)

    t.build_proposal_sampler(o, d, steps=120, batch=512)
    out_p = t.render_rays(o, d, chunk=32, sampler="proposal")
    out_c = t.render_rays(o, d, chunk=32)
    assert np.isfinite(out_p["rgb_fine"]).all()
    err = np.asarray(out_p["rgb_fine"]) - np.asarray(out_c["rgb_fine"])
    assert np.sqrt(np.mean(err**2)) < 0.05


def test_trainer_proposal_rejects_bad_configs():
    trainer, _ = _tiny_trainer(batch_norm=True, use_pallas=False)
    o = np.zeros((8, 3), np.float32)
    d = np.tile(np.float32([0, 0, -1]), (8, 1))
    with pytest.raises(ValueError, match="BatchNorm"):
        trainer.build_proposal_sampler(o, d, steps=1, batch=8)

    trainer2, _ = _tiny_trainer(ns_fine=0)
    with pytest.raises(ValueError, match="ns_fine"):
        trainer2.build_proposal_sampler(o, d, steps=1, batch=8)


def test_trainer_proposal_pallas_interpret_matches_xla():
    """The proposal fine pass dispatches through _make_pass_fn: the
    Pallas (interpret) and XLA arms must agree at the trainer level."""
    from nerf_keras_tpu.ops.rays import pose_spherical

    tr_x, cfg = _tiny_trainer(use_pallas=False)
    tr_p, _ = _tiny_trainer(use_pallas=True)
    tr_p.state = tr_p.state._replace(params=tr_x.state.params)

    pose = pose_spherical(30.0, -30.0, 4.0)
    o, d = tr_x.pose_rays(pose, cfg.height, cfg.width, 10.0)
    tr_x.build_proposal_sampler(o, d, steps=60, batch=256, seed=7)
    tr_p.build_proposal_sampler(o, d, steps=60, batch=256, seed=7)

    out_x = tr_x.render_rays(o, d, chunk=64, sampler="proposal")
    out_p = tr_p.render_rays(o, d, chunk=64, sampler="proposal")
    np.testing.assert_allclose(
        out_x["rgb_fine"], out_p["rgb_fine"], atol=2e-3
    )
