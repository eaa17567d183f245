import numpy as np
import jax
import jax.numpy as jnp

from nerf_keras_tpu.models import (
    apply_nerf_mlp,
    init_bn_state,
    init_nerf_params,
    param_count,
    trunk_input_dims,
)


def test_trunk_dims_reference_architecture():
    """8 layers, hidden 256, skip 4, xyz 63: only layer 5 sees the concat
    (reference models.py:38-39 wiring)."""
    dims = trunk_input_dims(8, 256, 4, 63)
    assert dims == [63, 256, 256, 256, 256, 256 + 63, 256, 256]


def test_param_count_matches_keras_formula():
    """Exact Keras param count for the default architecture."""
    params = init_nerf_params(jax.random.PRNGKey(0))
    expected = 0
    dims = [63, 256, 256, 256, 256, 319, 256, 256]
    for d in dims:
        expected += d * 256 + 256  # trunk
    expected += 256 * 1 + 1  # sigma head
    expected += 256 * 256 + 256  # feature
    expected += (256 + 27) * 128 + 128  # branch
    expected += 128 * 3 + 3  # rgb
    assert param_count(params) == expected


def test_forward_shapes_and_dtype():
    params = init_nerf_params(jax.random.PRNGKey(0))
    x = jnp.ones((4, 16, 63))
    d = jnp.ones((4, 16, 27))
    preds, bn = apply_nerf_mlp(params, x, d, compute_dtype=jnp.float32)
    assert preds.shape == (4, 16, 4)
    assert preds.dtype == jnp.float32
    assert bn is None


def test_bfloat16_close_to_float32():
    params = init_nerf_params(jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 63))
    d = jax.random.normal(jax.random.PRNGKey(3), (8, 8, 27))
    p32, _ = apply_nerf_mlp(params, x, d, compute_dtype=jnp.float32)
    p16, _ = apply_nerf_mlp(params, x, d, compute_dtype=jnp.bfloat16)
    # bf16 matmuls with f32 accumulation: loose but bounded agreement
    assert float(jnp.max(jnp.abs(p32 - p16))) < 0.15


def test_grad_flows_everywhere():
    params = init_nerf_params(jax.random.PRNGKey(0), num_layers=4, hidden_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 63))
    d = jax.random.normal(jax.random.PRNGKey(2), (16, 27))

    def loss(p):
        preds, _ = apply_nerf_mlp(p, x, d, compute_dtype=jnp.float32)
        return jnp.sum(preds**2)

    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert float(jnp.sum(jnp.abs(leaf))) > 0.0


def test_batchnorm_variant():
    params = init_nerf_params(
        jax.random.PRNGKey(0), num_layers=2, hidden_dim=16, batch_norm=True
    )
    bn = init_bn_state(params)
    assert bn is not None and len(bn["trunk"]) == 2
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 63)) * 3 + 1
    d = jax.random.normal(jax.random.PRNGKey(2), (64, 27))

    preds, new_bn = apply_nerf_mlp(
        params, x, d, compute_dtype=jnp.float32, bn_state=bn, train=True
    )
    # running stats moved toward the batch stats
    assert not np.allclose(np.asarray(new_bn["trunk"][0]["mean"]), 0.0)
    # eval mode uses running stats, leaves them unchanged
    preds_eval, bn_eval = apply_nerf_mlp(
        params, x, d, compute_dtype=jnp.float32, bn_state=new_bn, train=False
    )
    np.testing.assert_array_equal(
        np.asarray(bn_eval["trunk"][0]["mean"]),
        np.asarray(new_bn["trunk"][0]["mean"]),
    )


def test_final_skip_layer_head_width():
    """num_layers=5, skip=4: the heads must consume hidden+xyz."""
    params = init_nerf_params(jax.random.PRNGKey(0), num_layers=5, hidden_dim=32)
    assert params["sigma"]["w"].shape[0] == 32 + 63
    x = jnp.ones((4, 63))
    d = jnp.ones((4, 27))
    preds, _ = apply_nerf_mlp(params, x, d, compute_dtype=jnp.float32)
    assert preds.shape == (4, 4)


def test_glorot_init_scale():
    params = init_nerf_params(jax.random.PRNGKey(0))
    w = np.asarray(params["trunk"][1]["w"])  # (256, 256)
    limit = np.sqrt(6.0 / (256 + 256))
    assert np.abs(w).max() <= limit + 1e-6
    assert w.std() > 0.5 * limit / np.sqrt(3)  # uniform std = limit/sqrt(3)
    np.testing.assert_array_equal(np.asarray(params["trunk"][0]["b"]), 0.0)


def test_simple_legacy_mlp_shapes_and_skip():
    """Legacy single-input variant (reference models.py:11-22): output
    (..., 4), skip concat at layer 4 reflected in parameter shapes."""
    import jax.numpy as jnp
    from nerf_keras_tpu.models.mlp import (
        apply_simple_nerf_mlp,
        init_simple_nerf_params,
    )

    params = init_simple_nerf_params(
        jax.random.PRNGKey(0), num_layers=8, hidden_dim=64, l_xyz=4
    )
    xyz = 3 + 6 * 4
    assert params["trunk"][0]["w"].shape == (xyz, 64)
    assert params["trunk"][5]["w"].shape == (64 + xyz, 64)  # after skip at 4
    assert params["head"]["w"].shape == (64, 4)

    x = jnp.ones((10, 7, xyz))
    out = apply_simple_nerf_mlp(params, x, compute_dtype=jnp.float32)
    assert out.shape == (10, 7, 4)
    assert jnp.all(jnp.isfinite(out))
