"""Online proposal-sampler TRAINING tests (TRAIN_SAMPLER='proposal').

Beyond-reference mode (config docstring): the tiny proposal net replaces
the 8x256 coarse MLP inside the train step and is optimized jointly by
distilling the fine pass's compositing-weight histogram (Mip-NeRF-360-
style interlevel loss, ops/proposal.py).  Runs on the virtual 8-device
CPU mesh — trainer-level cases exercise the sharded {'proposal','fine'}
param tree end-to-end.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_keras_tpu.config import NeRFConfig, config_from_dict, to_reference_json
from nerf_keras_tpu.ops.proposal import binned_fine_weights, interlevel_loss


def _tiny_cfg(**over):
    kw = dict(
        batch_size=64, ns_coarse=8, ns_fine=8, height=8, width=8,
        l_xyz=4, l_dir=2, num_layers=4, hidden_dim=32, skip_layer=4,
        compute_dtype="float32", train_sampler="proposal",
        prop_l_xyz=2, prop_hidden=16, prop_depth=2,
    )
    kw.update(over)
    return NeRFConfig(**kw).validate()


def _tiny_trainer(**over):
    from nerf_keras_tpu.engine.trainer import Trainer

    cfg = _tiny_cfg(**over)
    return Trainer(cfg, 2.0, 6.0), cfg


def _batch(n=64, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(size=(n, 3)).astype(np.float32)
    o = np.tile(np.array([0, 0, 4.0], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return imgs, o, d


# ---------------------------------------------------------------- ops


def test_binned_fine_weights_matches_numpy(rng):
    """One-hot-einsum binning == a numpy searchsorted re-derivation."""
    B, J, S = 5, 6, 13
    t_vals = np.sort(rng.uniform(2.0, 6.0, (B, J)), axis=-1).astype(np.float32)
    t_extra = rng.uniform(2.0, 6.0, (B, S - J)).astype(np.float32)
    # The union contains the bin edges themselves (as sorted_union yields).
    t_all = np.sort(np.concatenate([t_vals, t_extra], -1), -1).astype(np.float32)
    w = rng.uniform(0.0, 0.2, (B, S)).astype(np.float32)

    got = np.asarray(binned_fine_weights(
        jnp.asarray(t_all), jnp.asarray(w), jnp.asarray(t_vals)
    ))

    want = np.zeros((B, J), np.float32)
    for b in range(B):
        # bin j covers [t_vals[j], t_vals[j+1]); last bin extends to inf
        idx = np.searchsorted(t_vals[b], t_all[b], side="right") - 1
        for s in range(S):
            if idx[s] >= 0:
                want[b, idx[s]] += w[b, s]
    np.testing.assert_allclose(got, want, atol=1e-6)
    # mass below the first edge is dropped, everything else conserved
    kept = t_all >= t_vals[:, :1]
    np.testing.assert_allclose(
        got.sum(-1), (w * kept).sum(-1), atol=1e-6
    )


def test_interlevel_loss_one_sided():
    """Zero when the proposal covers the target; positive when it
    under-covers; over-coverage alone is free."""
    target = jnp.array([[0.1, 0.5, 0.1]])
    covered = jnp.array([[0.2, 0.6, 0.2]])
    assert float(interlevel_loss(covered, target)) == 0.0
    under = jnp.array([[0.2, 0.1, 0.2]])
    assert float(interlevel_loss(under, target)) > 0.0
    # gradient pulls the under-covering bin UP and leaves covered bins alone
    g = jax.grad(lambda w: interlevel_loss(w, target))(under)
    assert float(g[0, 1]) < 0.0
    assert float(g[0, 0]) == 0.0 and float(g[0, 2]) == 0.0


# ------------------------------------------------------------- config


def test_config_validation_and_roundtrip():
    with pytest.raises(ValueError, match="STOP_PDF_GRADIENT"):
        _tiny_cfg(stop_pdf_gradient=False)
    with pytest.raises(ValueError, match="BatchNorm"):
        _tiny_cfg(batch_norm=True)
    with pytest.raises(ValueError, match="NS_FINE"):
        _tiny_cfg(ns_fine=0)
    with pytest.raises(ValueError, match="train_sampler"):
        _tiny_cfg(train_sampler="grid")
    with pytest.raises(ValueError, match="PROP_DEPTH"):
        _tiny_cfg(prop_depth=1)
    with pytest.raises(ValueError, match="PROP_EXPLORE"):
        _tiny_cfg(prop_explore=1.0)
    with pytest.raises(ValueError, match="PROP_EXPLORE"):
        _tiny_cfg(prop_explore=-0.1)
    with pytest.raises(ValueError, match="PROP_UNION"):
        NeRFConfig(prop_union=False).validate()  # needs proposal mode

    cfg = _tiny_cfg()
    raw = to_reference_json(cfg)
    assert raw["TRAIN_SAMPLER"] == "proposal"
    assert config_from_dict(raw) == cfg


# ------------------------------------------------------------ training


def test_online_train_step_learns():
    """Both losses decrease and BOTH param subtrees receive updates."""
    trainer, _ = _tiny_trainer()
    assert set(trainer.state.params) == {"proposal", "fine"}
    batch = trainer.put_batch(_batch())
    p0 = jax.device_get(trainer.state.params)

    m0 = trainer.train_step(batch)
    for _ in range(15):
        m = trainer.train_step(batch)

    assert float(m["loss"]) < float(m0["loss"])
    assert float(m["loss_coarse"]) < float(m0["loss_coarse"])  # distill loss
    p1 = jax.device_get(trainer.state.params)
    for name in ("proposal", "fine"):
        moved = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - b).max()), p0[name], p1[name]
        )
        assert max(jax.tree_util.tree_leaves(moved)) > 0.0, name


def test_online_eval_and_render():
    trainer, cfg = _tiny_trainer()
    imgs, o, d = _batch()
    trainer.train_step(trainer.put_batch((imgs, o, d)))

    ev = trainer.eval_step(trainer.put_global_batch((imgs, o, d)))
    assert set(ev) == {"loss", "loss_coarse", "psnr"}
    assert all(np.isfinite(float(v)) for v in ev.values())

    out = trainer.render_rays(o, d, chunk=64)
    assert sorted(out) == ["depth_fine", "rgb_fine"]
    assert np.isfinite(out["rgb_fine"]).all()
    # sampler='proposal' is an alias for the (already-proposal) default
    alias = trainer.render_rays(o, d, chunk=64, sampler="proposal")
    np.testing.assert_allclose(alias["rgb_fine"], out["rgb_fine"])

    with pytest.raises(ValueError, match="no coarse pass"):
        trainer.render_rays(o, d, chunk=64, full=True)
    with pytest.raises(ValueError, match="no coarse"):
        trainer.render_rays(o, d, chunk=64, keys=("rgb_coarse",))
    with pytest.raises(ValueError, match="proposal net in the train state"):
        trainer.build_proposal_sampler(o, d)


def test_online_checkpoint_roundtrip(tmp_path):
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.utils.checkpoint import save_checkpoint

    trainer, cfg = _tiny_trainer()
    imgs, o, d = _batch()
    for _ in range(3):
        trainer.train_step(trainer.put_batch((imgs, o, d)))
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, trainer.state, cfg,
                    scene={"near": 2.0, "far": 6.0, "focal": 10.0, "ndc": False})

    restored = Trainer(cfg, 2.0, 6.0).restore(path)
    np.testing.assert_allclose(
        trainer.render_rays(o, d, chunk=64)["rgb_fine"],
        restored.render_rays(o, d, chunk=64)["rgb_fine"],
    )
    # training continues bit-identically from the restored optimizer state
    m_a = trainer.train_step(trainer.put_batch((imgs, o, d)))
    m_b = restored.train_step(restored.put_batch((imgs, o, d)))
    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), abs=1e-7)


def test_online_quant_render():
    """int8 fine pass under the in-state proposal sampler."""
    trainer, cfg = _tiny_trainer()
    imgs, o, d = _batch()
    for _ in range(5):
        trainer.train_step(trainer.put_batch((imgs, o, d)))

    with pytest.raises(RuntimeError, match="quantize_for_inference"):
        trainer.render_rays(o, d, chunk=64, quant=True)
    trainer.quantize_for_inference(o, d)
    assert set(trainer._qparams) == {"fine"}  # proposal net stays float
    q = trainer.render_rays(o, d, chunk=64, quant=True)
    f = trainer.render_rays(o, d, chunk=64)
    err = np.sqrt(np.mean((q["rgb_fine"] - f["rgb_fine"]) ** 2))
    assert err < 0.05
    # weight-derived state invalidates on weight change, as for coarse mode
    trainer.train_step(trainer.put_batch((imgs, o, d)))
    with pytest.raises(RuntimeError, match="quantize_for_inference"):
        trainer.render_rays(o, d, chunk=64, quant=True)


def test_online_pallas_interpret_matches_xla():
    """The proposal-mode train step must agree between the XLA fine pass
    and the Pallas (interpret on CPU) megakernel fine pass."""
    tr_x, cfg = _tiny_trainer(use_pallas=False, sampling_mode="center")
    tr_p, _ = _tiny_trainer(use_pallas=True, sampling_mode="center")
    # Host round-trip: device_put of an already-matching sharding ALIASES
    # the buffers, and tr_x's donated train_step would delete tr_p's state.
    tr_p.state = jax.device_put(
        jax.device_get(tr_x.state), tr_p._state_shardings
    )

    batch = _batch()
    key = jax.random.PRNGKey(3)
    m_x = tr_x.train_step(tr_x.put_batch(batch), key)
    m_p = tr_p.train_step(tr_p.put_batch(batch), key)
    assert float(m_x["loss"]) == pytest.approx(float(m_p["loss"]), rel=1e-4)
    assert float(m_x["loss_coarse"]) == pytest.approx(
        float(m_p["loss_coarse"]), rel=1e-3, abs=1e-5
    )


def test_union_free_train_eval_render_quant():
    """PROP_UNION=false: the fine pass sees only the NS_FINE placed
    samples (Mip-NeRF-360 layout) — training learns, eval is finite,
    renders are finite, and the int8 path composes."""
    trainer, cfg = _tiny_trainer(prop_union=False)
    imgs, o, d = _batch()
    m0 = trainer.train_step(trainer.put_batch((imgs, o, d)))
    for _ in range(15):
        m = trainer.train_step(trainer.put_batch((imgs, o, d)))
    assert float(m["loss"]) < float(m0["loss"])

    ev = trainer.eval_step(trainer.put_global_batch((imgs, o, d)))
    assert all(np.isfinite(float(v)) for v in ev.values())

    out = trainer.render_rays(o, d, chunk=64, keys=("rgb_fine",
                                                    "depth_fine",
                                                    "weights_fine"))
    assert np.isfinite(out["rgb_fine"]).all()
    # sortedness pin: compositing over UNSORTED placed samples yields
    # negative deltas -> negative alphas -> negative weights; sorted
    # t_all keeps every weight nonnegative and depth inside [0, far]
    w = np.asarray(out["weights_fine"])
    assert (w >= -1e-6).all(), w.min()
    depth = np.asarray(out["depth_fine"])
    assert (depth >= 0).all() and (depth <= 6.0 + 1e-4).all()

    trainer.quantize_for_inference(o, d)
    q = trainer.render_rays(o, d, chunk=64, quant=True)
    err = np.sqrt(np.mean((q["rgb_fine"] - out["rgb_fine"]) ** 2))
    assert err < 0.05


def test_union_free_pallas_interpret_matches_xla():
    tr_x, cfg = _tiny_trainer(
        use_pallas=False, sampling_mode="center", prop_union=False
    )
    tr_p, _ = _tiny_trainer(
        use_pallas=True, sampling_mode="center", prop_union=False
    )
    tr_p.state = jax.device_put(
        jax.device_get(tr_x.state), tr_p._state_shardings
    )
    batch = _batch()
    key = jax.random.PRNGKey(3)
    m_x = tr_x.train_step(tr_x.put_batch(batch), key)
    m_p = tr_p.train_step(tr_p.put_batch(batch), key)
    assert float(m_x["loss"]) == pytest.approx(float(m_p["loss"]), rel=1e-4)


def test_explore_floor_training_only():
    """PROP_EXPLORE perturbs the TRAINING draw (different fine-sample
    placement -> different loss) but never eval/render."""
    imgs, o, d = _batch()
    key = jax.random.PRNGKey(5)
    losses, renders = [], []
    for e in (0.0, 0.5):
        tr, _ = _tiny_trainer(prop_explore=e)
        m = tr.train_step(tr.put_batch((imgs, o, d)), key)
        losses.append(float(m["loss"]))
        # re-init to identical params for the render comparison
        tr2, _ = _tiny_trainer(prop_explore=e)
        renders.append(tr2.render_rays(o, d, chunk=64)["rgb_fine"])
    assert losses[0] != losses[1]
    np.testing.assert_allclose(renders[0], renders[1], atol=0)


def test_online_training_ndc_config():
    """Online proposal training in NDC space: the proposal net sees the
    SAME (NDC) rays and t in [0, 1] as the fine model — training must
    learn and renders stay finite (mirrors the offline sampler's NDC
    test, tests/test_proposal.py)."""
    from nerf_keras_tpu.engine.trainer import Trainer

    trainer = Trainer(_tiny_cfg(ndc=True), 0.0, 1.0)  # NDC depth domain

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    o, d = trainer.pose_rays(pose, 8, 8, 12.0)
    np.testing.assert_allclose(np.asarray(o)[:, 2], -1.0, atol=1e-6)
    imgs = np.random.default_rng(0).uniform(size=(64, 3)).astype(np.float32)

    m0 = trainer.train_step(trainer.put_batch((imgs, o, d)))
    for _ in range(10):
        m = trainer.train_step(trainer.put_batch((imgs, o, d)))
    assert float(m["loss"]) < float(m0["loss"])
    out = trainer.render_rays(o, d, chunk=64)
    assert np.isfinite(out["rgb_fine"]).all()


def test_proposal_ready_property():
    trainer, _ = _tiny_trainer()
    assert trainer.proposal_ready  # in-state net, no distillation needed


def test_online_training_with_distortion_loss():
    """DISTORTION_LOSS_MULT composes with the online-proposal step (both
    union layouts): loss finite and decreasing, and the regularizer term
    actually contributes.  The ``loss`` METRIC is the fine MSE (reference
    key semantics, models.py:84-86) so it is identical across mults at
    step 0 — the contribution pin is the UPDATE: distortion gradients
    flow into the fine net, so one step with the mult moves the fine
    params differently than an identically-seeded control without it."""
    from nerf_keras_tpu.engine.trainer import Trainer

    batch = _batch()
    for union in (True, False):
        cfg_r = _tiny_cfg(
            distortion_loss_mult=0.05, use_pallas=False, prop_union=union
        )
        tr = Trainer(cfg_r, 2.0, 6.0)
        b = tr.put_batch(batch)
        m0 = tr.train_step(b)
        # control: identical config/seed with the regularizer off — a
        # regression that drops the mult from the proposal-mode loss
        # would leave the post-step fine params bit-identical
        cfg_0 = _tiny_cfg(
            distortion_loss_mult=0.0, use_pallas=False, prop_union=union
        )
        tr_0 = Trainer(cfg_0, 2.0, 6.0)
        m0_ctl = tr_0.train_step(tr_0.put_batch(batch))
        # same params, same batch, same key: the reported fine MSE is
        # identical at step 0 regardless of the regularizer...
        assert float(m0["loss"]) == pytest.approx(float(m0_ctl["loss"]))
        # ...but the applied update must differ (and only via the mult)
        leaves_r = jax.tree_util.tree_leaves(
            jax.device_get(tr.state.params["fine"])
        )
        leaves_0 = jax.tree_util.tree_leaves(
            jax.device_get(tr_0.state.params["fine"])
        )
        delta = max(
            float(np.max(np.abs(a - b))) for a, b in zip(leaves_r, leaves_0)
        )
        assert delta > 1e-7, (union, delta)
        for _ in range(10):
            m = tr.train_step(b)
        assert np.isfinite(float(m["loss"])), union
        assert float(m["loss"]) < float(m0["loss"]), union


def test_online_training_white_bkgd():
    """WHITE_BKGD composes with online-proposal training (fine pass
    composited; loss decreases) and with its eval/render paths."""
    from nerf_keras_tpu.engine.trainer import Trainer

    cfg = _tiny_cfg(white_bkgd=True, use_pallas=False)
    tr = Trainer(cfg, 2.0, 6.0)
    b = tr.put_batch(_batch())
    m0 = tr.train_step(b)
    for _ in range(10):
        m = tr.train_step(b)
    assert float(m["loss"]) < float(m0["loss"])
    float(tr.eval_step(tr.put_global_batch(_batch()))["psnr"])
    # empty-scene sanity: force zero density (sigma head weights/bias
    # pinned hard-negative -> relu(sigma)=0 -> all compositing weights 0)
    # and the white background MUST show through as ~1.0 everywhere — a
    # dropped (1-acc) compositing term renders black and this catches it.
    params = jax.device_get(tr.state.params)
    for net in ("proposal", "fine"):
        if net in params and "sigma" in params[net]:
            params[net]["sigma"] = jax.tree_util.tree_map(
                lambda a: np.full_like(a, -50.0), params[net]["sigma"]
            )
    tr.replace_params(params, tr.state.bn)
    out = tr.render_rays(*_batch()[1:], chunk=64, keys=("rgb_fine",))
    np.testing.assert_allclose(np.asarray(out["rgb_fine"]), 1.0, atol=1e-3)


def test_prop_target_blur_override():
    """PROP_TARGET_BLUR overrides the layout rule: union-mode training
    with blur=True trains (losses finite, params move) and produces a
    DIFFERENT proposal gradient signal than the unblurred default."""
    imgs, o, d = _batch()

    def train_2_steps(**over):
        trainer, _ = _tiny_trainer(**over)
        batch = trainer.put_batch((imgs, o, d))
        for _ in range(2):
            metrics = trainer.train_step(batch)
        assert np.isfinite(float(metrics["loss"]))
        return trainer.state.params["proposal"]

    base = train_2_steps(prop_union=True)
    blurred = train_2_steps(prop_union=True, prop_target_blur=True)
    leaves_b = jax.tree_util.tree_leaves(base)
    leaves_u = jax.tree_util.tree_leaves(blurred)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)
        for a, b in zip(leaves_b, leaves_u)
    )
    # and blur=False forces the unblurred target in union-free mode
    # (where blur is the layout DEFAULT): the proposal gradient signal
    # must differ from the default union-free run — if the override were
    # ignored these trainings would be identical
    nob = train_2_steps(prop_union=False, prop_target_blur=False)
    dflt = train_2_steps(prop_union=False)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(nob),
                        jax.tree_util.tree_leaves(dflt))
    )


def test_prop_target_blur_config_roundtrip():
    cfg = config_from_dict({
        "BATCH_SIZE": 64, "NS_COARSE": 8, "NS_FINE": 8, "HEIGHT": 8,
        "WIDTH": 8, "L_XYZ": 4, "L_DIR": 2, "NUM_LAYERS": 2,
        "HIDDEN_DIM": 16, "SKIP_LAYER": 4, "EPOCHS": 1,
        "LEARNING_RATE": 1e-3, "BATCH_NORM": False, "WITH_GCS": False,
        "TRAIN_SAMPLER": "proposal", "PROP_TARGET_BLUR": True,
    })
    assert cfg.prop_target_blur is True
    assert to_reference_json(cfg)["PROP_TARGET_BLUR"] is True


def test_prop_anneal_steps():
    """PROP_ANNEAL_STEPS softens the early TRAINING draw (different
    fine-sample placement at step 0 -> different loss) but never touches
    eval/render; validation pins it to proposal mode."""
    with pytest.raises(ValueError, match="PROP_ANNEAL_STEPS"):
        NeRFConfig(prop_anneal_steps=100).validate()  # needs proposal mode
    with pytest.raises(ValueError, match="PROP_ANNEAL_STEPS"):
        _tiny_cfg(prop_anneal_steps=-2)
    # -1 = auto is a valid CONFIG (the training CLI resolves it to the run
    # horizon) but must be resolved before the train step is built.
    assert _tiny_cfg(prop_anneal_steps=-1).prop_anneal_steps == -1
    with pytest.raises(ValueError, match="auto"):
        _tiny_trainer(prop_anneal_steps=-1)

    imgs, o, d = _batch()
    key = jax.random.PRNGKey(7)
    losses, renders = [], []
    for n in (0, 1000):
        tr, _ = _tiny_trainer(prop_anneal_steps=n, prop_explore=0.0)
        m = tr.train_step(tr.put_batch((imgs, o, d)), key)
        assert np.isfinite(float(m["loss"]))
        losses.append(float(m["loss"]))
        tr2, _ = _tiny_trainer(prop_anneal_steps=n, prop_explore=0.0)
        renders.append(tr2.render_rays(o, d, chunk=64)["rgb_fine"])
    # at step 0 the annealed draw is uniform (b=0 -> w^0), not the
    # proposal's volume-render weights
    assert losses[0] != losses[1]
    np.testing.assert_allclose(renders[0], renders[1], atol=0)

    # JSON key roundtrip
    cfg = _tiny_cfg(prop_anneal_steps=512)
    raw = to_reference_json(cfg)
    assert raw["PROP_ANNEAL_STEPS"] == 512
    assert config_from_dict(raw) == cfg

# ------------------------------------------------- hierarchical chain


def test_chain_init_and_nets():
    from nerf_keras_tpu.ops.proposal import chain_nets, init_proposal_chain

    key = jax.random.PRNGKey(0)
    single = init_proposal_chain(key, 1, l_xyz=2, hidden=16, depth=2)
    assert "layers" in single and chain_nets(single) == [single]

    two = init_proposal_chain(key, 2, l_xyz=2, hidden=16, depth=2)
    assert set(two) == {"l1", "l2"}
    nets = chain_nets(two)
    assert nets[0] is two["l1"] and nets[1] is two["l2"]
    # independent nets (different init draws)
    d = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()),
        two["l1"]["layers"][0]["w"], two["l2"]["layers"][0]["w"],
    )
    assert d > 0.0


def test_chain_sampler_shapes_and_monotone():
    """Deterministic chain: t_all ascending, right shapes for both
    layouts, level partitions ascending."""
    from nerf_keras_tpu.ops.proposal import (
        init_proposal_chain,
        make_chain_sampler,
    )
    from nerf_keras_tpu.ops.sampling import generate_t_vals

    cfg = _tiny_cfg(prop_levels=2, prop_samples=6, prop_union=False)
    pp = init_proposal_chain(jax.random.PRNGKey(1), 2, l_xyz=cfg.prop_l_xyz,
                             hidden=16, depth=2)
    _, o, d = _batch(16)
    t_vals = generate_t_vals(None, 2.0, 6.0, (16,), cfg.ns_coarse, "center")

    chain = make_chain_sampler(cfg, cfg.prop_l_xyz, False, 2, 6, train=False)
    t_all, levels = chain(pp, jnp.asarray(o), jnp.asarray(d), t_vals,
                          None, None)
    assert t_all.shape == (16, cfg.ns_fine)
    assert (np.diff(np.asarray(t_all), axis=-1) >= 0).all()
    (w1, p1), (w2, p2) = levels
    assert w1.shape == p1.shape == (16, cfg.ns_coarse)
    # level-2 partition = uniform grid UNION the 6 refinement draws
    assert w2.shape == p2.shape == (16, cfg.ns_coarse + 6)
    assert (np.diff(np.asarray(p2), axis=-1) >= 0).all()
    # coverage guarantee: the grid edges are in the partition
    grid = np.asarray(t_vals[0])
    assert all(np.isin(g, np.asarray(p2[0])).all() for g in (grid,))

    chain_u = make_chain_sampler(cfg, cfg.prop_l_xyz, True, 2, 6, train=False)
    t_u, _ = chain_u(pp, jnp.asarray(o), jnp.asarray(d), t_vals, None, None)
    assert t_u.shape == (16, cfg.ns_coarse + cfg.ns_fine)
    assert (np.diff(np.asarray(t_u), axis=-1) >= 0).all()

    # level-count mismatch raises
    with pytest.raises(ValueError, match="PROP_LEVELS"):
        make_chain_sampler(cfg, cfg.prop_l_xyz, False, 1, 0, train=False)(
            pp, jnp.asarray(o), jnp.asarray(d), t_vals, None, None
        )


def test_chain_config_validation():
    with pytest.raises(ValueError, match="PROP_LEVELS"):
        _tiny_cfg(prop_levels=3)
    with pytest.raises(ValueError, match="PROP_SAMPLES"):
        _tiny_cfg(prop_levels=2, prop_samples=1)
    with pytest.raises(ValueError, match="PROP_SAMPLES"):
        _tiny_cfg(prop_samples=8)  # needs levels=2
    with pytest.raises(ValueError, match="PROP_LEVELS"):
        NeRFConfig(train_sampler="coarse", prop_levels=2).validate()
    # JSON roundtrip carries the chain knobs
    cfg = _tiny_cfg(prop_levels=2, prop_samples=12)
    raw = to_reference_json(cfg)
    assert raw["PROP_LEVELS"] == 2 and raw["PROP_SAMPLES"] == 12
    assert config_from_dict(raw) == cfg


def test_chain_train_eval_render_learns():
    """2-level chain: losses fall, BOTH level nets get updates, eval and
    render work, union-free layout."""
    trainer, cfg = _tiny_trainer(prop_levels=2, prop_samples=6,
                                 prop_union=False)
    assert set(trainer.state.params["proposal"]) == {"l1", "l2"}
    imgs, o, d = _batch()
    batch = trainer.put_batch((imgs, o, d))
    p0 = jax.device_get(trainer.state.params["proposal"])
    m0 = trainer.train_step(batch)
    for _ in range(15):
        m = trainer.train_step(batch)
    assert float(m["loss"]) < float(m0["loss"])
    p1 = jax.device_get(trainer.state.params["proposal"])
    for lvl in ("l1", "l2"):
        moved = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - b).max()), p0[lvl], p1[lvl]
        )
        assert max(jax.tree_util.tree_leaves(moved)) > 0.0, lvl

    ev = trainer.eval_step(trainer.put_global_batch((imgs, o, d)))
    assert all(np.isfinite(float(v)) for v in ev.values())
    out = trainer.render_rays(o, d, chunk=64)
    assert out["rgb_fine"].shape == (64, 3)
    assert np.isfinite(out["rgb_fine"]).all()


def test_chain_checkpoint_roundtrip_and_sidecar(tmp_path):
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.utils.checkpoint import (
        resolve_infer_config,
        save_checkpoint,
    )

    trainer, cfg = _tiny_trainer(prop_levels=2, prop_samples=6)
    imgs, o, d = _batch()
    for _ in range(3):
        trainer.train_step(trainer.put_batch((imgs, o, d)))
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, trainer.state, cfg,
                    scene={"near": 2.0, "far": 6.0, "focal": 10.0,
                           "ndc": False})

    restored = Trainer(cfg, 2.0, 6.0).restore(path)
    np.testing.assert_allclose(
        trainer.render_rays(o, d, chunk=64)["rgb_fine"],
        restored.render_rays(o, d, chunk=64)["rgb_fine"],
    )
    # a plain (non-chain) user config adopts the sidecar's chain arch
    plain = NeRFConfig(**{
        f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)
        if f.name not in ("prop_levels", "prop_samples")
    }).validate()
    resolved, notes = resolve_infer_config(plain, path)
    assert resolved.prop_levels == 2 and resolved.prop_samples == 6
    assert any("train_sampler" in n for n in notes)


def test_chain_quant_and_pallas_interpret():
    """int8 fine pass under the 2-level chain sampler; Pallas interpret
    fine megakernel agrees with the XLA fine pass."""
    trainer, cfg = _tiny_trainer(prop_levels=2, prop_samples=6,
                                 prop_union=False)
    imgs, o, d = _batch()
    for _ in range(5):
        trainer.train_step(trainer.put_batch((imgs, o, d)))
    trainer.quantize_for_inference(o, d)
    q = trainer.render_rays(o, d, chunk=64, quant=True)
    f = trainer.render_rays(o, d, chunk=64)
    err = np.sqrt(np.mean((q["rgb_fine"] - f["rgb_fine"]) ** 2))
    assert err < 0.05

    tr_p, _ = _tiny_trainer(prop_levels=2, prop_samples=6,
                            prop_union=False, use_pallas=True,
                            sampling_mode="center")
    tr_x, _ = _tiny_trainer(prop_levels=2, prop_samples=6,
                            prop_union=False, use_pallas=False,
                            sampling_mode="center")
    tr_p.state = jax.device_put(
        jax.device_get(tr_x.state), tr_p._state_shardings
    )
    key = jax.random.PRNGKey(3)
    m_x = tr_x.train_step(tr_x.put_batch((imgs, o, d)), key)
    m_p = tr_p.train_step(tr_p.put_batch((imgs, o, d)), key)
    assert float(m_x["loss"]) == pytest.approx(float(m_p["loss"]), rel=1e-4)


# ---------------------------------- union-free coverage supervision (r5)


def test_aux_coverage_config_validation():
    with pytest.raises(ValueError, match="PROP_AUX_SAMPLES"):
        _tiny_cfg(prop_union=False, prop_aux_samples=1)
    with pytest.raises(ValueError, match="PROP_AUX_SAMPLES"):
        _tiny_cfg(prop_union=False, prop_aux_samples=-4)
    with pytest.raises(ValueError, match="union"):
        _tiny_cfg(prop_aux_samples=8)  # union layout already has coverage
    with pytest.raises(ValueError, match="PROP_AUX_SAMPLES"):
        NeRFConfig(train_sampler="coarse", prop_aux_samples=8).validate()
    with pytest.raises(ValueError, match="PROP_AUX_LOSS_MULT"):
        _tiny_cfg(prop_union=False, prop_aux_samples=8,
                  prop_aux_loss_mult=-1.0)
    with pytest.raises(ValueError, match="PROP_UNION_EVERY"):
        _tiny_cfg(prop_union=False, prop_union_every=1)
    with pytest.raises(ValueError, match="PROP_UNION_EVERY"):
        _tiny_cfg(prop_union_every=4)  # needs PROP_UNION=false
    with pytest.raises(ValueError, match="PROP_UNION_EVERY"):
        NeRFConfig(train_sampler="coarse", prop_union_every=4).validate()
    # JSON roundtrip carries the r5 knobs
    cfg = _tiny_cfg(prop_union=False, prop_aux_samples=8,
                    prop_aux_loss_mult=0.5, prop_union_every=4)
    raw = to_reference_json(cfg)
    assert raw["PROP_AUX_SAMPLES"] == 8
    assert raw["PROP_AUX_LOSS_MULT"] == 0.5
    assert raw["PROP_UNION_EVERY"] == 4
    assert config_from_dict(raw) == cfg


def test_aux_coverage_trains_and_contributes():
    """PROP_AUX_SAMPLES: loss decreases, and the aux term actually moves
    the fine params (identically-seeded control with mult=0 differs after
    one step)."""
    batch = _batch()
    tr, _ = _tiny_trainer(prop_union=False, prop_aux_samples=4)
    b = tr.put_batch(batch)
    m0 = tr.train_step(b)
    tr0, _ = _tiny_trainer(prop_union=False, prop_aux_samples=4,
                           prop_aux_loss_mult=0.0)
    tr0.train_step(tr0.put_batch(batch))
    leaves_a = jax.tree_util.tree_leaves(
        jax.device_get(tr.state.params["fine"]))
    leaves_0 = jax.tree_util.tree_leaves(
        jax.device_get(tr0.state.params["fine"]))
    delta = max(float(np.max(np.abs(a - b)))
                for a, b in zip(leaves_a, leaves_0))
    assert delta > 1e-7
    for _ in range(15):
        m = tr.train_step(b)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])


def test_aux_coverage_training_only():
    """The aux pass never touches eval/render: identically-initialized
    trainers with and without it render bit-identically before training."""
    _, o, d = _batch()
    tr_a, _ = _tiny_trainer(prop_union=False, prop_aux_samples=4)
    tr_b, _ = _tiny_trainer(prop_union=False)
    np.testing.assert_allclose(
        tr_a.render_rays(o, d, chunk=64)["rgb_fine"],
        tr_b.render_rays(o, d, chunk=64)["rgb_fine"], atol=0,
    )


def test_aux_coverage_pallas_interpret_matches_xla():
    tr_x, _ = _tiny_trainer(use_pallas=False, sampling_mode="center",
                            prop_union=False, prop_aux_samples=8)
    tr_p, _ = _tiny_trainer(use_pallas=True, sampling_mode="center",
                            prop_union=False, prop_aux_samples=8)
    tr_p.state = jax.device_put(
        jax.device_get(tr_x.state), tr_p._state_shardings
    )
    batch = _batch()
    key = jax.random.PRNGKey(3)
    m_x = tr_x.train_step(tr_x.put_batch(batch), key)
    m_p = tr_p.train_step(tr_p.put_batch(batch), key)
    assert float(m_x["loss"]) == pytest.approx(float(m_p["loss"]), rel=1e-4)


def test_interleaved_union_branches():
    """PROP_UNION_EVERY=2: step 0 runs the UNION branch — bit-identical
    params to a pure-union trainer after one identically-seeded step —
    and step 1 runs the union-free branch (diverges from pure union)."""
    batch = _batch()
    key = jax.random.PRNGKey(11)
    tr_il, _ = _tiny_trainer(prop_union=False, prop_union_every=2)
    tr_u, _ = _tiny_trainer(prop_union=True)
    m_il = tr_il.train_step(tr_il.put_batch(batch), key)
    m_u = tr_u.train_step(tr_u.put_batch(batch), key)
    # step 0: 0 % 2 == 0 -> union branch; same init/key -> identical step
    assert float(m_il["loss"]) == pytest.approx(float(m_u["loss"]),
                                                abs=1e-7)
    leaves_il = jax.tree_util.tree_leaves(
        jax.device_get(tr_il.state.params))
    leaves_u = jax.tree_util.tree_leaves(jax.device_get(tr_u.state.params))
    for a, b in zip(leaves_il, leaves_u):
        np.testing.assert_allclose(a, b, atol=1e-6)
    # step 1 dispatches the union-free branch: the trainers diverge
    m_il = tr_il.train_step(tr_il.put_batch(batch), key)
    m_u = tr_u.train_step(tr_u.put_batch(batch), key)
    leaves_il = jax.tree_util.tree_leaves(
        jax.device_get(tr_il.state.params))
    leaves_u = jax.tree_util.tree_leaves(jax.device_get(tr_u.state.params))
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)
        for a, b in zip(leaves_il, leaves_u)
    )
    # and keeps training stably (both branches keep compiling/learning)
    for _ in range(10):
        m = tr_il.train_step(tr_il.put_batch(batch))
    assert np.isfinite(float(m["loss"]))


def test_interleaved_union_composes_with_aux():
    """PROP_UNION_EVERY + PROP_AUX_SAMPLES: the aux pass rides only the
    union-free steps; training is finite and learns."""
    tr, _ = _tiny_trainer(prop_union=False, prop_union_every=2,
                          prop_aux_samples=4)
    b = tr.put_batch(_batch())
    m0 = tr.train_step(b)
    for _ in range(15):
        m = tr.train_step(b)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])
