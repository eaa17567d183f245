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
