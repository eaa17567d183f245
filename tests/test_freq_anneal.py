"""Coarse-to-fine frequency annealing (FREQ_ANNEAL_STEPS).

Beyond-reference training-quality knob (ops/freq_anneal.py): the window
is implemented as a WEIGHT FOLD — scaling the rows of the encode-
consuming matrices instead of the encodings — so the core contract here
is algebraic equivalence: ``mlp(fold(params, w), enc)`` must equal
``mlp(params, enc * w)`` exactly (same dots, f32).  Plus the gradient
semantics (masked octave rows frozen at init), the schedule shape, and
the trainer-level plumbing (eval uses the current window; identity past
the horizon; config validation; sidecar adoption).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_keras_tpu.config import NeRFConfig
from nerf_keras_tpu.models.mlp import apply_nerf_mlp, init_nerf_params
from nerf_keras_tpu.ops.encoding import encode_position
from nerf_keras_tpu.ops.freq_anneal import (
    anneal_alpha,
    fold_nerf_params,
    fold_proposal_params,
    fold_train_params,
    freq_window,
)
from nerf_keras_tpu.ops.proposal import apply_proposal, init_proposal


# ---------------------------------------------------------------- window


def test_window_schedule_shape():
    L = 4
    w0 = np.asarray(freq_window(L, 0.0))
    assert w0.shape == (3 + 6 * L,)
    # alpha=0: identity block only.
    assert np.allclose(w0[:3], 1.0) and np.allclose(w0[3:], 0.0)
    # alpha=1: fully open.
    assert np.allclose(np.asarray(freq_window(L, 1.0)), 1.0)
    # alpha=0.5 with L=4: octaves 0,1 open, 2,3 closed.
    w = np.asarray(freq_window(L, 0.5))
    assert np.allclose(w[3:9], 1.0) and np.allclose(w[9:15], 1.0)
    assert np.allclose(w[15:], 0.0)
    # Mid-ease: alpha*L - j = 0.5 -> cosine ease gives exactly 0.5.
    w = np.asarray(freq_window(L, 1.5 / L))
    assert np.allclose(w[9:15], 0.5, atol=1e-6)
    # Monotone per octave in alpha.
    for a, b in [(0.1, 0.3), (0.3, 0.7), (0.7, 0.95)]:
        assert np.all(
            np.asarray(freq_window(L, b)) >= np.asarray(freq_window(L, a)) - 1e-7
        )


def test_window_l0_is_identity():
    assert np.allclose(np.asarray(freq_window(0, 0.0)), 1.0)


def test_anneal_alpha_clips():
    assert float(anneal_alpha(0, 10)) == 0.0
    assert float(anneal_alpha(5, 10)) == 0.5
    assert float(anneal_alpha(25, 10)) == 1.0


# ---------------------------------------------------------------- fold ==
# windowed-encoding equivalence (the algebraic contract)


@pytest.mark.parametrize(
    "num_layers,skip_layer",
    [
        (4, 4),   # no skip reached, trunk[0] only
        (4, 2),   # skip at i=2; layer 3 consumes [h, x_enc]
        (3, 2),   # last layer IS a skip -> sigma/feature heads consume enc
    ],
)
def test_fold_matches_windowed_encodings(num_layers, skip_layer, rng):
    l_xyz, l_dir, hidden = 4, 2, 16
    params = init_nerf_params(
        jax.random.PRNGKey(0), num_layers=num_layers, hidden_dim=hidden,
        skip_layer=skip_layer, l_xyz=l_xyz, l_dir=l_dir,
    )
    x = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    x_enc = encode_position(x, l_xyz)
    d_enc = encode_position(d, l_dir)
    w = freq_window(l_xyz, 0.37)

    folded = fold_nerf_params(params, w)
    got, _ = apply_nerf_mlp(
        folded, x_enc, d_enc, compute_dtype=jnp.float32,
        skip_layer=skip_layer,
    )
    want, _ = apply_nerf_mlp(
        params, x_enc * w, d_enc, compute_dtype=jnp.float32,
        skip_layer=skip_layer,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # Identity window is a no-op on every leaf.
    ident = fold_nerf_params(params, freq_window(l_xyz, 1.0))
    for a, b in zip(
        jax.tree_util.tree_leaves(ident), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_fold_proposal_matches_windowed_encodings(rng):
    l_xyz = 3
    params = init_proposal(jax.random.PRNGKey(1), l_xyz=l_xyz, hidden=16,
                           depth=3)
    x = jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)
    x_enc = encode_position(x, l_xyz)
    w = freq_window(l_xyz, 0.61)
    got = apply_proposal(fold_proposal_params(params, w), x_enc)
    want = apply_proposal(params, x_enc * w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fold_train_params_handles_both_trees():
    cfg = NeRFConfig(
        l_xyz=4, l_dir=2, num_layers=4, hidden_dim=16, skip_layer=2,
        prop_l_xyz=2, prop_hidden=8, prop_depth=2,
        freq_anneal_steps=100,
    ).validate()
    from nerf_keras_tpu.engine.step import init_train_state

    # coarse/fine tree
    st = init_train_state(jax.random.PRNGKey(0), cfg)
    folded = fold_train_params(cfg, st.params, jnp.asarray(30))
    assert set(folded) == {"coarse", "fine"}
    # masked top octave rows are zeroed in trunk[0]
    top = np.asarray(folded["fine"]["trunk"][0]["w"])[-6:]
    assert np.allclose(top, 0.0)
    # proposal/fine tree
    cfg_p = dataclasses.replace(
        cfg, train_sampler="proposal", prop_anneal_steps=50,
    ).validate()
    st = init_train_state(jax.random.PRNGKey(0), cfg_p)
    folded = fold_train_params(cfg_p, st.params, jnp.asarray(30))
    assert set(folded) == {"proposal", "fine"}
    ptop = np.asarray(folded["proposal"]["layers"][0]["w"])[-6:]
    assert np.allclose(ptop, 0.0)
    # past the horizon: identity
    ident = fold_train_params(cfg_p, st.params, jnp.asarray(10_000))
    for a, b in zip(
        jax.tree_util.tree_leaves(ident), jax.tree_util.tree_leaves(st.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


# ---------------------------------------------------------------- training
# semantics: masked rows frozen at init, open rows train


def _batch(n=64, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(size=(n, 3)).astype(np.float32)
    o = np.tile(np.array([0, 0, 4.0], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return imgs, o, d


def test_masked_octaves_receive_zero_gradient():
    from nerf_keras_tpu.engine.trainer import Trainer

    cfg = NeRFConfig(
        batch_size=64, ns_coarse=8, ns_fine=8, height=8, width=8,
        l_xyz=4, l_dir=2, num_layers=4, hidden_dim=32, skip_layer=2,
        compute_dtype="float32", freq_anneal_steps=1000,
    ).validate()
    tr = Trainer(cfg, 2.0, 6.0)
    w0 = np.asarray(tr.state.params["fine"]["trunk"][0]["w"]).copy()
    for _ in range(2):
        tr.train_step(tr.put_batch(_batch()))
    w1 = np.asarray(tr.state.params["fine"]["trunk"][0]["w"])
    # At steps 0-1 of a 1000-step anneal octave 0 has barely cracked open
    # (the ease is continuous) but octaves >= 1 are EXACTLY closed: zero
    # gradient, zero Adam update — bit-identical to init.
    np.testing.assert_array_equal(w1[9:], w0[9:])
    assert np.abs(w1[:3] - w0[:3]).max() > 1e-6


def test_masked_rows_train_once_window_opens():
    from nerf_keras_tpu.engine.trainer import Trainer

    cfg = NeRFConfig(
        batch_size=64, ns_coarse=8, ns_fine=8, height=8, width=8,
        l_xyz=2, l_dir=2, num_layers=3, hidden_dim=16, skip_layer=4,
        compute_dtype="float32", freq_anneal_steps=4,
    ).validate()
    tr = Trainer(cfg, 2.0, 6.0)
    w0 = np.asarray(tr.state.params["fine"]["trunk"][0]["w"]).copy()
    for _ in range(8):  # run past the horizon
        tr.train_step(tr.put_batch(_batch()))
    w1 = np.asarray(tr.state.params["fine"]["trunk"][0]["w"])
    # Top octave opened at step >= 2 and must have moved by now.
    assert np.abs(w1[-6:] - w0[-6:]).max() > 1e-7


def test_eval_folds_current_window():
    """Mid-anneal eval must see the windowed weights: corrupting a MASKED
    octave row must not change eval metrics."""
    from nerf_keras_tpu.engine.trainer import Trainer

    cfg = NeRFConfig(
        batch_size=64, ns_coarse=8, ns_fine=8, height=8, width=8,
        l_xyz=4, l_dir=2, num_layers=3, hidden_dim=16, skip_layer=4,
        compute_dtype="float32", freq_anneal_steps=10_000,
    ).validate()
    tr = Trainer(cfg, 2.0, 6.0)
    batch = _batch()
    m0 = {k: float(v) for k, v in tr.eval_step(tr.put_global_batch(batch)).items()}
    params = jax.tree_util.tree_map(np.array, jax.device_get(tr.state.params))
    params["fine"]["trunk"][0]["w"][-6:] = 77.0  # masked octave rows
    tr.replace_params(params)
    m1 = {k: float(v) for k, v in tr.eval_step(tr.put_global_batch(batch)).items()}
    assert m0 == pytest.approx(m1, abs=1e-6)


# ---------------------------------------------------------------- config


def test_validation_rules():
    with pytest.raises(ValueError, match="FREQ_ANNEAL_STEPS"):
        NeRFConfig(freq_anneal_steps=-2).validate()
    with pytest.raises(ValueError, match="both set"):
        NeRFConfig(freq_anneal_steps=100, freq_anneal_epochs=2).validate()
    with pytest.raises(ValueError, match="BatchNorm"):
        NeRFConfig(freq_anneal_steps=100, batch_norm=True).validate()
    # -1 (auto) is a valid CONFIG, but step builders refuse it unresolved.
    cfg = NeRFConfig(freq_anneal_steps=-1).validate()
    from nerf_keras_tpu.engine.step import make_train_step

    with pytest.raises(ValueError, match="resolved"):
        make_train_step(cfg, 2.0, 6.0)


def test_json_round_trip():
    from nerf_keras_tpu.config import config_from_dict, to_reference_json

    cfg = config_from_dict({"FREQ_ANNEAL_STEPS": 123})
    assert cfg.freq_anneal_steps == 123
    assert to_reference_json(cfg)["FREQ_ANNEAL_STEPS"] == 123


@pytest.mark.slow
def test_cli_end_to_end_resolves_epochs(tmp_path, capsys):
    """FREQ_ANNEAL_EPOCHS resolves to steps in the train CLI and the
    sidecar records the RESOLVED horizon (what inference adopts)."""
    import json

    import train_synthetic
    from nerf_keras_tpu.cli.train import run_training

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "BATCH_SIZE": 128, "NS_COARSE": 4, "NS_FINE": 8,
        "HEIGHT": 12, "WIDTH": 12, "L_XYZ": 4, "L_DIR": 2,
        "NUM_LAYERS": 2, "HIDDEN_DIM": 16, "SKIP_LAYER": 4, "EPOCHS": 3,
        "LEARNING_RATE": 0.002, "BATCH_NORM": False, "WITH_GCS": False,
        "COMPUTE_DTYPE": "float32", "EVAL_EVERY": 3,
        "FREQ_ANNEAL_EPOCHS": 2,
    }))
    run_dir = tmp_path / "run"
    run_training(
        train_synthetic.prepare, str(cfg_path), default_eval_every=1,
        argv=["--config", str(cfg_path), "--run-dir", str(run_dir)],
    )
    out = capsys.readouterr().out
    assert "frequency anneal pinned" in out
    side = json.load(open(run_dir / "nerf_l2_d16_n12_ep3.ckpt.npz.config.json"))
    assert side["FREQ_ANNEAL_EPOCHS"] == 0
    # 12 views x 144 px, 80/20 interleave split -> 10 steps/epoch.
    assert side["FREQ_ANNEAL_STEPS"] == 2 * 10
    hist = json.load(open(run_dir / "history_l2_d16_n12_ep3.json"))
    assert hist["losses"][-1] < hist["losses"][0]


def test_sidecar_adoption(tmp_path):
    """resolve_infer_config adopts the trained window horizon."""
    import json

    from nerf_keras_tpu.config import to_reference_json
    from nerf_keras_tpu.utils.checkpoint import resolve_infer_config

    trained = NeRFConfig(freq_anneal_steps=500).validate()
    path = str(tmp_path / "ep1.ckpt.npz")
    (tmp_path / "ep1.ckpt.npz.config.json").write_text(
        json.dumps(to_reference_json(trained))
    )
    cfg, _ = resolve_infer_config(NeRFConfig().validate(), path)
    assert cfg.freq_anneal_steps == 500
    # Unresolved -1 from a direct-caller sidecar maps to the identity
    # window (1-step horizon: every restored step is past it).
    cfg, _ = resolve_infer_config(
        NeRFConfig(freq_anneal_steps=-1).validate(), None
    )
    assert cfg.freq_anneal_steps == 1
