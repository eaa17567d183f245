"""Parity: the fused Pallas MLP kernel must match the jnp reference path.

Runs in interpret mode on the virtual-CPU test mesh (the kernel autodetects
non-TPU backends); the same assertions run compiled on real TPU hardware
when executed there.  Small model sizes keep interpret mode fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_keras_tpu.models.mlp import apply_nerf_mlp, init_nerf_params
from nerf_keras_tpu.ops.pallas.fused_mlp import apply_nerf_mlp_pallas

L_XYZ, L_DIR = 4, 2  # enc widths 27 / 15
ARCH = dict(num_layers=4, hidden_dim=32, skip_layer=2, l_xyz=L_XYZ, l_dir=L_DIR)


@pytest.fixture(scope="module")
def params():
    return init_nerf_params(jax.random.PRNGKey(0), **ARCH)


def _inputs(n, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, 3 + 6 * L_XYZ)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3 + 6 * L_DIR)).astype(np.float32))
    return x, d


def test_forward_parity(params):
    # 70 rows: exercises padding to the tile size
    x, d = _inputs(70)
    ref, _ = apply_nerf_mlp(
        params, x, d, compute_dtype=jnp.float32, skip_layer=ARCH["skip_layer"]
    )
    out = apply_nerf_mlp_pallas(
        params, x, d, compute_dtype=jnp.float32, skip_layer=ARCH["skip_layer"],
        tile=64, bwd_tile=64,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_forward_parity_batched_shape(params):
    """Leading (B, S) batch shape flattens and restores correctly."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 16, 3 + 6 * L_XYZ)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(8, 16, 3 + 6 * L_DIR)).astype(np.float32))
    ref, _ = apply_nerf_mlp(
        params, x, d, compute_dtype=jnp.float32, skip_layer=ARCH["skip_layer"]
    )
    out = apply_nerf_mlp_pallas(
        params, x, d, compute_dtype=jnp.float32, skip_layer=ARCH["skip_layer"],
        tile=64, bwd_tile=64,
    )
    assert out.shape == (8, 16, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_gradient_parity(params):
    """Hand-written backward kernel vs autodiff through the jnp path —
    covers dW/db accumulation across grid steps and the dx/dd outputs
    (the fine-sample t-values need input grads; SURVEY.md §7 hard parts)."""
    x, d = _inputs(192, seed=2)

    def loss_ref(p, x, d):
        o, _ = apply_nerf_mlp(
            p, x, d, compute_dtype=jnp.float32, skip_layer=ARCH["skip_layer"]
        )
        return jnp.sum(jnp.sin(o))

    def loss_pal(p, x, d):
        o = apply_nerf_mlp_pallas(
            p, x, d, compute_dtype=jnp.float32, skip_layer=ARCH["skip_layer"],
            tile=64, bwd_tile=64,
        )
        return jnp.sum(jnp.sin(o))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(params, x, d)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(params, x, d)
    for r, p in zip(jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), atol=5e-4, rtol=1e-4
        )


def test_gradient_parity_skip_heavy():
    """skip_layer=1 concatenates after every layer — stresses the
    skip-gradient accumulation path."""
    arch = dict(num_layers=3, hidden_dim=16, skip_layer=1, l_xyz=2, l_dir=1)
    params = init_nerf_params(jax.random.PRNGKey(3), **arch)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(64, 15)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(64, 9)).astype(np.float32))

    def loss_ref(p):
        o, _ = apply_nerf_mlp(p, x, d, compute_dtype=jnp.float32, skip_layer=1)
        return jnp.sum(o**2)

    def loss_pal(p):
        o = apply_nerf_mlp_pallas(
            p, x, d, compute_dtype=jnp.float32, skip_layer=1, tile=32, bwd_tile=32
        )
        return jnp.sum(o**2)

    gr = jax.grad(loss_ref)(params)
    gp = jax.grad(loss_pal)(params)
    for r, p in zip(jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), atol=5e-4, rtol=1e-4)


def test_bf16_forward_close(params):
    """bf16 compute stays within bf16 tolerance of the f32 reference."""
    x, d = _inputs(64, seed=4)
    ref, _ = apply_nerf_mlp(
        params, x, d, compute_dtype=jnp.float32, skip_layer=ARCH["skip_layer"]
    )
    out = apply_nerf_mlp_pallas(
        params, x, d, compute_dtype=jnp.bfloat16, skip_layer=ARCH["skip_layer"],
        tile=64, bwd_tile=64,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.1, rtol=0.05)


def test_pallas_train_step_under_dp_mesh():
    """End-to-end: the pallas path trains under an 8-way data mesh via
    shard_map and matches the jnp path's loss on the same batch."""
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh

    kwargs = dict(
        batch_size=32, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16,
        l_xyz=2, l_dir=1, compute_dtype="float32",
    )
    cfg_p = NeRFConfig(use_pallas=True, **kwargs).validate()
    cfg_j = NeRFConfig(use_pallas=False, **kwargs).validate()

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (32, 3)).astype(np.float32)
    dirs = rng.normal(size=(32, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (32, 1))
    batch = (images, origins, dirs)

    t_p = Trainer(cfg_p, 2.0, 6.0, mesh=make_mesh(8, 1))
    t_j = Trainer(cfg_j, 2.0, 6.0, mesh=make_mesh(8, 1))
    m_p = t_p.train_step(t_p.put_batch(batch))
    m_j = t_j.train_step(t_j.put_batch(batch))
    np.testing.assert_allclose(
        float(m_p["loss"]), float(m_j["loss"]), rtol=1e-5
    )


def test_pallas_rejects_tensor_parallel():
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh

    kwargs = dict(
        batch_size=32, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16,
        use_pallas=True, mesh_model=2,
    )
    # config validation catches the combination at load time ...
    with pytest.raises(ValueError, match="tensor parallelism"):
        NeRFConfig(**kwargs).validate()
    # ... and the Trainer guard still covers unvalidated configs
    with pytest.raises(ValueError, match="tensor parallelism"):
        Trainer(NeRFConfig(**kwargs), 2.0, 6.0, mesh=make_mesh(4, 2))


def test_need_input_grads_false_skips_encoding_cotangents(params):
    """Weight grads stay exact; encoding cotangents come back as zeros."""
    x, d = _inputs(96, seed=5)

    def loss(p, x, d, need):
        o = apply_nerf_mlp_pallas(
            p, x, d, compute_dtype=jnp.float32, skip_layer=ARCH["skip_layer"],
            tile=64, bwd_tile=64, need_input_grads=need,
        )
        return jnp.sum(o**2)

    g_full = jax.grad(loss, argnums=(0, 1, 2))(params, x, d, True)
    g_skip = jax.grad(loss, argnums=(0, 1, 2))(params, x, d, False)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_full[0]), jax.tree_util.tree_leaves(g_skip[0])
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6)
    assert float(jnp.max(jnp.abs(g_skip[1]))) == 0.0
    assert float(jnp.max(jnp.abs(g_skip[2]))) == 0.0
    assert float(jnp.max(jnp.abs(g_full[1]))) > 0.0


def _ref_render(params, x_enc, d_enc, t):
    from nerf_keras_tpu.ops.volume import volume_render

    preds, _ = apply_nerf_mlp(
        params, x_enc, d_enc, compute_dtype=jnp.float32,
        skip_layer=ARCH["skip_layer"],
    )
    rgb, _, weights = volume_render(preds, t)
    return rgb, weights


def _render_inputs(b=12, s=16, seed=6):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, s, 3 + 6 * L_XYZ)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(b, s, 3 + 6 * L_DIR)).astype(np.float32))
    t = jnp.sort(
        jnp.asarray(rng.uniform(2.0, 6.0, size=(b, s)).astype(np.float32)),
        axis=-1,
    )
    return x, d, t


def test_fused_render_forward_parity(params):
    """Fused MLP+composite matches apply_nerf_mlp -> volume_render,
    including with a ray count that does not divide the ray tile."""
    from nerf_keras_tpu.ops.pallas.fused_render import apply_nerf_render_pallas

    x, d, t = _render_inputs(b=12, s=16)
    rgb_ref, w_ref = _ref_render(params, x, d, t)
    rgb, w = apply_nerf_render_pallas(
        params, x, d, t, compute_dtype=jnp.float32,
        skip_layer=ARCH["skip_layer"], max_tile_fwd=8 * 16, max_tile_bwd=4 * 16,
    )
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_render_weight_grad_parity(params):
    """Parameter gradients of an rgb-only loss match autodiff through the
    jnp MLP+composite chain (the detached-sampling training regime)."""
    from nerf_keras_tpu.ops.pallas.fused_render import apply_nerf_render_pallas

    x, d, t = _render_inputs(b=8, s=16, seed=7)
    target = jnp.asarray(
        np.random.default_rng(8).uniform(0, 1, (8, 3)).astype(np.float32)
    )

    def loss_ref(p):
        rgb, _ = _ref_render(p, x, d, t)
        return jnp.mean((rgb - target) ** 2)

    def loss_fused(p):
        rgb, _ = apply_nerf_render_pallas(
            p, x, d, t, compute_dtype=jnp.float32,
            skip_layer=ARCH["skip_layer"],
            max_tile_fwd=4 * 16, max_tile_bwd=4 * 16,
        )
        return jnp.mean((rgb - target) ** 2)

    gr = jax.grad(loss_ref)(params)
    gf = jax.grad(loss_fused)(params)
    for a, b in zip(jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)


def test_fused_render_weights_are_stop_gradient(params):
    """The fused path's weights output carries stop-gradient semantics —
    differentiating through it must give exact zeros (not wrong values)."""
    from nerf_keras_tpu.ops.pallas.fused_render import apply_nerf_render_pallas

    x, d, t = _render_inputs(b=8, s=16, seed=9)

    def loss(p):
        _, w = apply_nerf_render_pallas(
            p, x, d, t, compute_dtype=jnp.float32,
            skip_layer=ARCH["skip_layer"],
            max_tile_fwd=4 * 16, max_tile_bwd=4 * 16,
        )
        return jnp.sum(w**2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert float(jnp.max(jnp.abs(leaf))) == 0.0


def test_fused_render_grad_with_ray_padding(params):
    """Ray counts that don't divide the backward ray tile: padded rays get
    zero cotangents and must contribute nothing (grads still match)."""
    from nerf_keras_tpu.ops.pallas.fused_render import apply_nerf_render_pallas

    x, d, t = _render_inputs(b=12, s=16, seed=10)  # bwd tile = 8 rays

    def loss_ref(p):
        rgb, _ = _ref_render(p, x, d, t)
        return jnp.sum(rgb**2)

    def loss_fused(p):
        rgb, _ = apply_nerf_render_pallas(
            p, x, d, t, compute_dtype=jnp.float32,
            skip_layer=ARCH["skip_layer"],
            max_tile_fwd=8 * 16, max_tile_bwd=8 * 16,
        )
        return jnp.sum(rgb**2)

    gr = jax.grad(loss_ref)(params)
    gf = jax.grad(loss_fused)(params)
    for a, b in zip(jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)


def test_fused_eval_render_path_matches_jnp():
    """The eval step and render fn built with use_pallas take the fused
    forward kernel (engine/step.py:_make_fused_eval_forward) and must
    reproduce the jnp path's metrics and rgb/depth maps exactly in f32."""
    import dataclasses

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import (
        init_train_state,
        make_eval_step,
        make_render_fn,
    )

    cfg_p = NeRFConfig(
        batch_size=16, ns_coarse=8, ns_fine=16, num_layers=4, hidden_dim=32,
        skip_layer=2, l_xyz=L_XYZ, l_dir=L_DIR, compute_dtype="float32",
        use_pallas=True,
    ).validate()
    cfg_j = dataclasses.replace(cfg_p, use_pallas=False)
    state = init_train_state(jax.random.PRNGKey(0), cfg_p)

    rng = np.random.default_rng(11)
    images = jnp.asarray(rng.uniform(0, 1, (16, 3)).astype(np.float32))
    origins = jnp.asarray(np.tile([0, 0, 4.0], (16, 1)).astype(np.float32))
    dirs = rng.normal(size=(16, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))

    ev_p = make_eval_step(cfg_p, 2.0, 6.0)(state, (images, origins, dirs))
    ev_j = make_eval_step(cfg_j, 2.0, 6.0)(state, (images, origins, dirs))
    for k in ("loss_coarse", "loss", "psnr"):
        np.testing.assert_allclose(
            float(ev_p[k]), float(ev_j[k]), atol=1e-5, rtol=1e-5
        )

    r_p = make_render_fn(cfg_p, 2.0, 6.0)(state, origins, dirs)
    r_j = make_render_fn(cfg_j, 2.0, 6.0)(state, origins, dirs)
    assert set(r_p) == {"rgb_coarse", "rgb_fine", "depth_coarse", "depth_fine"}
    for k in r_p:
        np.testing.assert_allclose(
            np.asarray(r_p[k]), np.asarray(r_j[k]), atol=1e-5, rtol=1e-5
        )


def test_render_rays_fused_matches_jnp_chain():
    """The forward-only megakernel (raw rays in, in-kernel encode) must
    match sample_rays -> encode -> MLP -> volume_render in f32, including
    with a ray count that does not divide the ray tile."""
    from nerf_keras_tpu.ops import (
        encode_position,
        sample_rays,
        volume_render,
    )
    from nerf_keras_tpu.ops.pallas.fused_render import render_rays_fused

    l_xyz, l_dir = 4, 2
    params = init_nerf_params(jax.random.PRNGKey(3), **ARCH)
    rng = np.random.default_rng(12)
    b, s = 20, 16  # tile = 8 rays at max_tile_fwd=128 -> padding exercised
    origins = jnp.asarray(np.tile([0, 0, 4.0], (b, 1)).astype(np.float32))
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
    t = jnp.sort(
        jnp.asarray(rng.uniform(2.0, 6.0, size=(b, s)).astype(np.float32)),
        axis=-1,
    )

    pts, ds_ = sample_rays(origins, dirs, t)
    x_enc = encode_position(pts, l_xyz)
    d_enc = encode_position(ds_, l_dir)
    preds, _ = apply_nerf_mlp(
        params, x_enc, d_enc, compute_dtype=jnp.float32,
        skip_layer=ARCH["skip_layer"],
    )
    rgb_ref, _, w_ref = volume_render(preds, t)

    rgb, w = render_rays_fused(
        params, origins, dirs, t, l_xyz=l_xyz, l_dir=l_dir,
        compute_dtype=jnp.float32, skip_layer=ARCH["skip_layer"],
        max_tile_fwd=8 * 16,
    )
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("bwd_mode", ["residual", "recompute"])
def test_render_rays_fused_grads_match_jnp_chain(params, bwd_mode):
    """The raw-rays megakernel's custom_vjp — both backward strategies
    (encodings written as residuals / re-encoded in VMEM) — must
    reproduce the jnp chain's parameter grads, including with ray padding
    in the backward tile."""
    from nerf_keras_tpu.ops import encode_position, sample_rays
    from nerf_keras_tpu.ops.pallas.fused_render import render_rays_fused

    l_xyz, l_dir = 4, 2
    rng = np.random.default_rng(13)
    b, s = 20, 16  # bwd tile = 8 rays -> padding exercised
    origins = jnp.asarray(np.tile([0, 0, 4.0], (b, 1)).astype(np.float32))
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
    t = jnp.sort(
        jnp.asarray(rng.uniform(2.0, 6.0, size=(b, s)).astype(np.float32)),
        axis=-1,
    )
    target = jnp.asarray(rng.uniform(0, 1, (b, 3)).astype(np.float32))

    def loss_ref(p):
        pts, ds_ = sample_rays(origins, dirs, t)
        rgb, _ = _ref_render(
            p, encode_position(pts, l_xyz), encode_position(ds_, l_dir), t
        )
        return jnp.mean((rgb - target) ** 2)

    def loss_fused(p):
        rgb, _ = render_rays_fused(
            p, origins, dirs, t, l_xyz=l_xyz, l_dir=l_dir,
            compute_dtype=jnp.float32, skip_layer=ARCH["skip_layer"],
            max_tile_fwd=8 * 16, max_tile_bwd=8 * 16, bwd_mode=bwd_mode,
        )
        return jnp.mean((rgb - target) ** 2)

    gr = jax.grad(loss_ref)(params)
    gf = jax.grad(loss_fused)(params)
    for a, g in zip(jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)

    # weights output keeps stop-gradient semantics on the raw-rays path too
    def loss_w(p):
        _, w = render_rays_fused(
            p, origins, dirs, t, l_xyz=l_xyz, l_dir=l_dir,
            compute_dtype=jnp.float32, skip_layer=ARCH["skip_layer"],
            max_tile_fwd=8 * 16, max_tile_bwd=8 * 16, bwd_mode=bwd_mode,
        )
        return jnp.sum(w**2)

    for leaf in jax.tree_util.tree_leaves(jax.grad(loss_w)(params)):
        assert float(jnp.max(jnp.abs(leaf))) == 0.0


def test_pallas_eval_and_render_under_dp_mesh():
    """The FUSED eval step and render path (use_pallas) under an 8-way
    data mesh go through shard_map'd render_rays_fused and must match the
    jnp path on the same batch."""
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.parallel.mesh import make_mesh

    kwargs = dict(
        batch_size=32, ns_coarse=4, ns_fine=4, num_layers=2, hidden_dim=16,
        l_xyz=2, l_dir=1, compute_dtype="float32",
    )
    cfg_p = NeRFConfig(use_pallas=True, **kwargs).validate()
    cfg_j = NeRFConfig(use_pallas=False, **kwargs).validate()

    rng = np.random.default_rng(3)
    images = rng.uniform(0, 1, (32, 3)).astype(np.float32)
    dirs = rng.normal(size=(32, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.tile(np.array([0, 0, 4.0], np.float32), (32, 1))
    batch = (images, origins, dirs)

    t_p = Trainer(cfg_p, 2.0, 6.0, mesh=make_mesh(8, 1))
    t_j = Trainer(cfg_j, 2.0, 6.0, mesh=make_mesh(8, 1))

    e_p = t_p.eval_step(t_p.put_batch(batch))
    e_j = t_j.eval_step(t_j.put_batch(batch))
    for k in ("loss", "loss_coarse", "psnr"):
        np.testing.assert_allclose(float(e_p[k]), float(e_j[k]),
                                   rtol=1e-5, atol=1e-6)

    r_p = t_p.render_rays(origins, dirs, chunk=16)
    r_j = t_j.render_rays(origins, dirs, chunk=16)
    for k in ("rgb_fine", "depth_fine"):
        np.testing.assert_allclose(r_p[k], r_j[k], rtol=1e-5, atol=1e-6)


def test_encode_phase_trick_high_octave_accuracy():
    """The in-kernel encode computes ``cos z = sin(z + pi/2)`` via a phase
    row; f32 rounding of ``z + pi/2`` perturbs the phase by ~ulp(z)/2,
    which GROWS with the octave — ~1e-4 rad at the flagship top octave
    (l_xyz=10, far=6 -> z ~ 3e3), so the honest tolerance there is 1e-3,
    NOT the 1e-5 low-octave figure (round-2 advisor finding).  Low
    octaves must stay tight."""
    from nerf_keras_tpu.ops import encode_position
    from nerf_keras_tpu.ops.pallas.fused_render import (
        _encode_consts,
        _encode_tile,
    )

    l_xyz = 10
    e, d = _encode_consts(3, l_xyz)
    rng = np.random.default_rng(5)
    # Flagship-realistic coordinates: |o + t*d| with t in [2, 6].
    p = jnp.asarray(rng.uniform(-6.0, 6.0, size=(64, 3)).astype(np.float32))
    ref = encode_position(p, l_xyz)
    out = _encode_tile(p, jnp.asarray(e), d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=0)
    # First 4 octaves (z <= 2^3 * 6 = 48): phase error ~ulp(48)/2 ~ 2e-6.
    lo = 3 + 2 * 3 * 4
    np.testing.assert_allclose(np.asarray(out[:, :lo]),
                               np.asarray(ref[:, :lo]), atol=2e-5, rtol=0)


def test_fused_train_forward_step_parity():
    """The full fused (Pallas) train step matches the XLA forward's
    loss/psnr on the same batch and key."""
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.step import init_train_state, make_train_step

    kwargs = dict(
        batch_size=32, ns_coarse=6, ns_fine=10, num_layers=2, hidden_dim=16,
        l_xyz=2, l_dir=1, compute_dtype="float32",
    )
    cfg_p = NeRFConfig(use_pallas=True, **kwargs).validate()
    cfg_j = NeRFConfig(use_pallas=False, **kwargs).validate()

    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.uniform(0, 1, (32, 3)).astype(np.float32))
    dirs = rng.normal(size=(32, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.asarray(np.tile(np.array([0, 0, 4.0], np.float32), (32, 1)))
    batch = (images, origins, jnp.asarray(dirs))

    key = jax.random.PRNGKey(11)
    out = {}
    for name, cfg in (("pallas", cfg_p), ("jnp", cfg_j)):
        step = make_train_step(cfg, 2.0, 6.0)
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        _, metrics = step(state, batch, key)
        out[name] = metrics
    for k in ("loss", "loss_coarse", "psnr"):
        np.testing.assert_allclose(
            float(out["pallas"][k]), float(out["jnp"][k]),
            rtol=1e-5, atol=1e-6,
        )


@pytest.mark.parametrize("bwd_mode", ["residual", "recompute"])
def test_render_rays_fused_weights_grad_matches_jnp(params, bwd_mode):
    """weights_grad=True: a loss that consumes the WEIGHTS output (a
    random linear functional + the distortion regularizer) must produce
    the jnp chain's parameter grads — the kernel's weights-cotangent path
    seeds the compositing VJP correctly on both backward strategies."""
    from nerf_keras_tpu.ops import encode_position, sample_rays
    from nerf_keras_tpu.ops.pallas.fused_render import render_rays_fused
    from nerf_keras_tpu.ops.volume import distortion_loss

    l_xyz, l_dir = 4, 2
    rng = np.random.default_rng(29)
    b, s = 20, 16  # bwd tile = 8 rays -> padding exercised
    origins = jnp.asarray(np.tile([0, 0, 4.0], (b, 1)).astype(np.float32))
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
    t = jnp.sort(
        jnp.asarray(rng.uniform(2.0, 6.0, size=(b, s)).astype(np.float32)),
        axis=-1,
    )
    target = jnp.asarray(rng.uniform(0, 1, (b, 3)).astype(np.float32))
    lin = jnp.asarray(rng.normal(size=(b, s)).astype(np.float32))

    def combined(rgb, w):
        return (
            jnp.mean((rgb - target) ** 2)
            + 0.05 * jnp.sum(lin * w)
            + 0.1 * distortion_loss(t, w, 2.0, 6.0)
        )

    def loss_ref(p):
        pts, ds_ = sample_rays(origins, dirs, t)
        rgb, w = _ref_render(
            p, encode_position(pts, l_xyz), encode_position(ds_, l_dir), t
        )
        return combined(rgb, w)

    def loss_fused(p):
        rgb, w = render_rays_fused(
            p, origins, dirs, t, l_xyz=l_xyz, l_dir=l_dir,
            compute_dtype=jnp.float32, skip_layer=ARCH["skip_layer"],
            max_tile_fwd=8 * 16, max_tile_bwd=8 * 16, bwd_mode=bwd_mode,
            weights_grad=True,
        )
        return combined(rgb, w)

    np.testing.assert_allclose(
        float(loss_fused(params)), float(loss_ref(params)),
        atol=1e-5, rtol=1e-5,
    )
    gr = jax.grad(loss_ref)(params)
    gf = jax.grad(loss_fused)(params)
    nonzero = 0.0
    for a, g in zip(jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)
        nonzero = max(nonzero, float(jnp.max(jnp.abs(a))))
    assert nonzero > 0.0  # the weight-space terms actually flow


def test_fused_train_step_with_distortion_matches_xla():
    """A full Trainer train step with DISTORTION_LOSS_MULT on the Pallas
    path (interpret mode) matches the XLA path's loss/metrics — the
    distortion cotangent rides the megakernel end to end."""
    import dataclasses

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer

    cfg = NeRFConfig(
        batch_size=32, ns_coarse=4, ns_fine=4, height=8, width=8,
        l_xyz=3, l_dir=2, num_layers=2, hidden_dim=16, skip_layer=4,
        compute_dtype="float32", distortion_loss_mult=0.05,
        stop_pdf_gradient=True,
    ).validate()

    rng = np.random.default_rng(5)
    imgs = rng.uniform(size=(32, 3)).astype(np.float32)
    o = np.tile(np.array([0, 0, 4.0], np.float32), (32, 1))
    d = rng.normal(size=(32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = (imgs, o, d)

    out = {}
    for use_pallas in (True, False):
        c = dataclasses.replace(cfg, use_pallas=use_pallas).validate()
        tr = Trainer(c, 2.0, 6.0)
        for _ in range(3):
            m = tr.train_step(tr.put_batch(batch))
        out[use_pallas] = {k: float(v) for k, v in m.items()}
    for k in ("loss", "loss_coarse", "psnr"):
        np.testing.assert_allclose(
            out[True][k], out[False][k], rtol=2e-4, atol=1e-5,
        )


def test_fused_train_step_white_bkgd_matches_xla():
    """WHITE_BKGD (+ distortion) on the Pallas path: the (1 - acc)
    background term's weight-gradients ride the weights-cotangent
    backward on BOTH passes; step metrics match the XLA path."""
    import dataclasses

    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer

    cfg = NeRFConfig(
        batch_size=32, ns_coarse=4, ns_fine=4, height=8, width=8,
        l_xyz=3, l_dir=2, num_layers=2, hidden_dim=16, skip_layer=4,
        compute_dtype="float32", white_bkgd=True,
        distortion_loss_mult=0.02, stop_pdf_gradient=True,
    ).validate()

    rng = np.random.default_rng(6)
    imgs = rng.uniform(size=(32, 3)).astype(np.float32)
    o = np.tile(np.array([0, 0, 4.0], np.float32), (32, 1))
    d = rng.normal(size=(32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = (imgs, o, d)

    out = {}
    for use_pallas in (True, False):
        c = dataclasses.replace(cfg, use_pallas=use_pallas).validate()
        tr = Trainer(c, 2.0, 6.0)
        for _ in range(3):
            m = tr.train_step(tr.put_batch(batch))
        out[use_pallas] = {k: float(v) for k, v in m.items()}
        # eval + render paths compose the background identically
        e = tr.eval_step(tr.put_global_batch(batch))
        out[use_pallas]["eval_loss"] = float(e["loss"])
        r = tr.render_rays(o, d, chunk=32, keys=("rgb_fine",))
        out[use_pallas]["rgb0"] = float(np.mean(r["rgb_fine"]))
    for k in ("loss", "loss_coarse", "psnr", "eval_loss", "rgb0"):
        np.testing.assert_allclose(
            out[True][k], out[False][k], rtol=2e-4, atol=1e-5,
        )


def test_reshape_moves_flag_parity(monkeypatch):
    """NKT_RESHAPE_MOVES path (round-5 probe: Mosaic's widen reshape +
    broadcast-expand — measured 0.73x the selector design on hardware,
    kept behind a flag for future-toolchain re-probes) must stay
    numerically correct: forward megakernel parity vs the jnp chain in
    interpret mode with the flag forced on."""
    import nerf_keras_tpu.ops.pallas.fused_render as fr
    from nerf_keras_tpu.ops import (
        encode_position,
        sample_rays,
        volume_render,
    )

    monkeypatch.setattr(fr, "_RESHAPE_MOVES", True)

    l_xyz, l_dir = 4, 2
    params = init_nerf_params(jax.random.PRNGKey(3), **ARCH)
    rng = np.random.default_rng(12)
    b, s = 20, 16
    origins = jnp.asarray(np.tile([0, 0, 4.0], (b, 1)).astype(np.float32))
    dirs = rng.normal(size=(b, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
    t = jnp.sort(
        jnp.asarray(rng.uniform(2.0, 6.0, size=(b, s)).astype(np.float32)),
        axis=-1,
    )

    pts, ds_ = sample_rays(origins, dirs, t)
    preds, _ = apply_nerf_mlp(
        params, encode_position(pts, l_xyz), encode_position(ds_, l_dir),
        compute_dtype=jnp.float32, skip_layer=ARCH["skip_layer"],
    )
    rgb_ref, _, w_ref = volume_render(preds, t)

    rgb, w = fr.render_rays_fused(
        params, origins, dirs, t, l_xyz=l_xyz, l_dir=l_dir,
        compute_dtype=jnp.float32, skip_layer=ARCH["skip_layer"],
        max_tile_fwd=8 * 16,
    )
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                               atol=1e-5, rtol=1e-5)
