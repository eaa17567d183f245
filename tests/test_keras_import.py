"""Reference-weights importer: layout mapping + forward parity.

The fixtures (tests/fixtures/, built by scripts/make_keras_fixture.py in a
keras-capable environment) are GENUINE Keras 3 ``save_weights`` output for
the reference architecture (reference models.py:24-62, trainer attribute
layout models.py:67-68) plus golden inference-mode forward outputs.  These
tests prove that importing a reference ``.weights.h5`` into our pytree and
running our jnp MLP reproduces the reference model's outputs — the
mechanism that makes PSNR parity provable once real trained weights are
available (BASELINE.md quality target).
"""

import os

import numpy as np
import pytest

from nerf_keras_tpu.config import NeRFConfig
from nerf_keras_tpu.models.mlp import apply_nerf_mlp, init_bn_state
from nerf_keras_tpu.utils.keras_import import import_reference_weights

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

CFG = NeRFConfig(
    num_layers=6, hidden_dim=32, skip_layer=4, l_xyz=10, l_dir=4,
    compute_dtype="float32",
)
CFG_BN = NeRFConfig(
    num_layers=6, hidden_dim=32, skip_layer=4, l_xyz=10, l_dir=4,
    compute_dtype="float32", batch_norm=True,
)


def _golden():
    return np.load(os.path.join(FIXTURES, "ref_tiny_golden.npz"))


def test_import_plain_forward_parity():
    import jax.numpy as jnp

    params, bn = import_reference_weights(
        os.path.join(FIXTURES, "ref_tiny_plain.weights.h5"), CFG
    )
    assert bn is None
    g = _golden()
    for which in ("coarse", "fine"):
        preds, _ = apply_nerf_mlp(
            params[which],
            jnp.asarray(g["x_enc"]),
            jnp.asarray(g["d_enc"]),
            compute_dtype=jnp.float32,
            skip_layer=CFG.skip_layer,
        )
        np.testing.assert_allclose(
            np.asarray(preds), g[f"out_{which}_plain"], rtol=2e-4, atol=2e-4
        )


def test_import_bn_forward_parity():
    import jax.numpy as jnp

    params, bn = import_reference_weights(
        os.path.join(FIXTURES, "ref_tiny_bn.weights.h5"), CFG_BN
    )
    assert bn is not None
    g = _golden()
    for which in ("coarse", "fine"):
        preds, _ = apply_nerf_mlp(
            params[which],
            jnp.asarray(g["x_enc"]),
            jnp.asarray(g["d_enc"]),
            compute_dtype=jnp.float32,
            skip_layer=CFG_BN.skip_layer,
            bn_state=bn[which],
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(preds), g[f"out_{which}_bn"], rtol=2e-4, atol=2e-4
        )


def test_import_structure_matches_init():
    """The imported pytree has exactly the init_nerf_params structure, so
    it drops into TrainState.params / Trainer unchanged."""
    import jax

    from nerf_keras_tpu.engine.step import init_train_state

    params, bn = import_reference_weights(
        os.path.join(FIXTURES, "ref_tiny_bn.weights.h5"), CFG_BN
    )
    state = init_train_state(jax.random.PRNGKey(0), CFG_BN)
    ref_struct = jax.tree_util.tree_structure(state.params)
    got_struct = jax.tree_util.tree_structure(params)
    assert ref_struct == got_struct
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(state.params)[0],
        jax.tree_util.tree_flatten_with_path(params)[0],
    ):
        assert np.shape(a) == np.shape(b), (pa, np.shape(a), np.shape(b))
    # bn state structure matches too
    bn_ref = {k: init_bn_state(v) for k, v in state.params.items()}
    assert jax.tree_util.tree_structure(bn) == jax.tree_util.tree_structure(
        bn_ref
    )


def test_import_rejects_wrong_config():
    with pytest.raises(ValueError, match="trunk"):
        import_reference_weights(
            os.path.join(FIXTURES, "ref_tiny_plain.weights.h5"),
            NeRFConfig(num_layers=8, hidden_dim=32, skip_layer=4,
                       l_xyz=10, l_dir=4),
        )
    with pytest.raises(ValueError, match="kernel shape"):
        import_reference_weights(
            os.path.join(FIXTURES, "ref_tiny_plain.weights.h5"),
            NeRFConfig(num_layers=6, hidden_dim=32, skip_layer=4,
                       l_xyz=4, l_dir=4),
        )


@pytest.mark.slow
def test_live_keras_roundtrip():
    """When keras is importable, build a FRESH reference model (not the
    committed fixture), save, import, and compare forwards — guards the
    fixture itself against staleness across keras versions."""
    keras = pytest.importorskip("keras")
    import jax.numpy as jnp

    import scripts.make_keras_fixture as mk

    t = mk.make_trainer(bn=False)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 3, 63)).astype(np.float32)
    d = rng.normal(0, 1, (2, 3, 27)).astype(np.float32)
    t([x, d])
    mk.randomize(t, seed=11)
    want_c, want_f = (np.asarray(o) for o in t([x, d], training=False))
    path = "/tmp/live_roundtrip.weights.h5"
    t.save_weights(path)

    params, _ = import_reference_weights(path, CFG)
    for which, want in (("coarse", want_c), ("fine", want_f)):
        got, _ = apply_nerf_mlp(
            params[which], jnp.asarray(x), jnp.asarray(d),
            compute_dtype=jnp.float32, skip_layer=4,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Exporter (the inverse direction: our params -> reference .weights.h5)
# ---------------------------------------------------------------------------

def _our_params(cfg):
    import jax

    from nerf_keras_tpu.models.mlp import init_nerf_params

    k = jax.random.PRNGKey(3)
    kc, kf = jax.random.split(k)
    mk_one = lambda key: init_nerf_params(
        key, num_layers=cfg.num_layers, hidden_dim=cfg.hidden_dim,
        skip_layer=cfg.skip_layer, l_xyz=cfg.l_xyz, l_dir=cfg.l_dir,
        batch_norm=cfg.batch_norm,
    )
    params = {"coarse": mk_one(kc), "fine": mk_one(kf)}
    bn = None
    if cfg.batch_norm:
        # Non-trivial running stats so the export is actually exercised.
        rng = np.random.default_rng(5)
        bn = {}
        for which in params:
            st = init_bn_state(params[which])
            st = {
                "trunk": [
                    {"mean": rng.normal(0, 0.3, s["mean"].shape).astype(
                         np.float32),
                     "var": rng.uniform(0.5, 2.0, s["var"].shape).astype(
                         np.float32)}
                    for s in st["trunk"]
                ],
                "branch": {
                    "mean": rng.normal(
                        0, 0.3, st["branch"]["mean"].shape
                    ).astype(np.float32),
                    "var": rng.uniform(
                        0.5, 2.0, st["branch"]["var"].shape
                    ).astype(np.float32),
                },
            }
            bn[which] = st
    return params, bn


@pytest.mark.parametrize("cfg", [CFG, CFG_BN], ids=["plain", "bn"])
def test_export_import_roundtrip(cfg, tmp_path):
    """export -> import recovers the exact pytree (both directions share
    the layout contract, so this pins the exporter against the importer
    the committed fixtures already pin against real keras)."""
    import jax

    from nerf_keras_tpu.utils.keras_export import export_reference_weights

    params, bn = _our_params(cfg)
    path = str(tmp_path / "ours.weights.h5")
    export_reference_weights(path, params, cfg, bn_state=bn)

    got_p, got_bn = import_reference_weights(path, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b)
        ),
        params, got_p,
    )
    if cfg.batch_norm:
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
            bn, got_bn,
        )
    else:
        assert got_bn is None


def test_export_rejects_proposal_state(tmp_path):
    from nerf_keras_tpu.utils.keras_export import export_reference_weights

    params, _ = _our_params(CFG)
    params = {"proposal": {"w": np.zeros((3, 3))}, "fine": params["fine"]}
    with pytest.raises(ValueError, match="proposal"):
        export_reference_weights(
            str(tmp_path / "x.weights.h5"), params, CFG
        )


@pytest.mark.slow
@pytest.mark.parametrize("bn", [False, True], ids=["plain", "bn"])
def test_export_live_keras_load(bn, tmp_path):
    """The real contract: a FRESH reference-architecture keras model
    load_weights()'s our exported file and reproduces our MLP's forward —
    i.e. a checkpoint trained here serves through the reference's own
    tooling (reference inference.py:158-170)."""
    pytest.importorskip("keras")
    import jax.numpy as jnp

    import scripts.make_keras_fixture as mk
    from nerf_keras_tpu.utils.keras_export import export_reference_weights

    cfg = CFG_BN if bn else CFG
    params, bn_state = _our_params(cfg)
    path = str(tmp_path / "ours.weights.h5")
    export_reference_weights(path, params, cfg, bn_state=bn_state)

    t = mk.make_trainer(bn=bn)
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 3, 63)).astype(np.float32)
    d = rng.normal(0, 1, (2, 3, 27)).astype(np.float32)
    t([x, d])  # build
    t.load_weights(path)
    got_c, got_f = (np.asarray(o) for o in t([x, d], training=False))

    for which, got in (("coarse", got_c), ("fine", got_f)):
        want, _ = apply_nerf_mlp(
            params[which], jnp.asarray(x), jnp.asarray(d),
            compute_dtype=jnp.float32, skip_layer=cfg.skip_layer,
            bn_state=None if bn_state is None else bn_state[which],
            train=False,
        )
        np.testing.assert_allclose(
            got, np.asarray(want), rtol=2e-4, atol=2e-4
        )


def test_export_cli_roundtrip_and_ema_routing(tmp_path):
    """export_keras.py end to end: run dir resolution, sidecar config
    resolution, and EMA checkpoints exporting the SERVING (shadow)
    weights — the same parameters every other inference path reads."""
    import json

    import jax

    from nerf_keras_tpu.cli.export_keras import run_export
    from nerf_keras_tpu.engine.step import init_train_state
    from nerf_keras_tpu.utils.checkpoint import save_checkpoint

    cfg_dict = {
        "BATCH_SIZE": 64, "NS_COARSE": 4, "NS_FINE": 4,
        "HEIGHT": 8, "WIDTH": 8, "L_XYZ": 2, "L_DIR": 1,
        "NUM_LAYERS": 2, "HIDDEN_DIM": 16, "SKIP_LAYER": 4,
        "EPOCHS": 1, "LEARNING_RATE": 0.0005, "BATCH_NORM": False,
        "WITH_GCS": False, "EMA_DECAY": 0.9,
    }
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(cfg_dict))
    cfg = NeRFConfig(
        batch_size=64, ns_coarse=4, ns_fine=4, height=8, width=8,
        l_xyz=2, l_dir=1, num_layers=2, hidden_dim=16, skip_layer=4,
        ema_decay=0.9,
    ).validate()

    state = init_train_state(jax.random.PRNGKey(0), cfg)
    # Make the EMA shadow distinguishable from the live params.
    shadow = jax.tree_util.tree_map(lambda a: a + 1.0, state.params)
    state = state._replace(ema=shadow)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    save_checkpoint(str(run_dir / "tiny.ckpt.npz"), state, cfg)

    out = str(tmp_path / "exported.weights.h5")
    run_export([
        "--config", str(cfg_path), "--checkpoint", str(run_dir),
        "--out", out,
    ])

    got, _ = import_reference_weights(out, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6
        ),
        shadow, got,
    )
