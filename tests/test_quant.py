"""int8 post-training quantization: calibration, folding, kernel parity.

Layers of the contract (ops/quant.py + ops/pallas/quant_render.py):

1. quantize_activation round-trips within half an LSB;
2. the folded-scale quantized MLP tracks the f32 MLP within int8 noise;
3. the Pallas quant megakernel is (numerically) IDENTICAL to the jnp
   quantized reference — both trace ops/quant.py:quant_forward_tile, so
   any divergence is a kernel wiring bug, not quantization error;
4. the skip-concat columns (heterogeneous scales) are handled by the
   per-row folding — pinned by a targeted asymmetric-magnitude case;
5. end-to-end: the quantized render of a trained tiny model stays within
   a PSNR gate of the float render (the user-facing contract behind
   ``cli/infer.py --quant int8``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_keras_tpu.models.mlp import apply_nerf_mlp, init_nerf_params
from nerf_keras_tpu.ops import encode_position, generate_t_vals, sample_rays
from nerf_keras_tpu.ops.quant import (
    QMAX,
    apply_nerf_mlp_quant,
    calibrate_render,
    flatten_qparams,
    merge_absmax,
    mlp_calibration_absmax,
    n_flat_qparams,
    quantize_activation,
    quantize_mlp,
    quantize_render_params,
)
from nerf_keras_tpu.ops.volume import volume_render

L_XYZ, L_DIR = 6, 3


@pytest.fixture
def tiny_mlp():
    params = init_nerf_params(
        jax.random.PRNGKey(0), num_layers=8, hidden_dim=64, skip_layer=4,
        l_xyz=L_XYZ, l_dir=L_DIR,
    )
    rng = np.random.default_rng(0)
    n = 2048
    pts = jnp.asarray(rng.uniform(-4, 4, (n, 3)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    x_enc = encode_position(pts, L_XYZ)
    d_enc = encode_position(dirs, L_DIR)
    return params, x_enc, d_enc


def test_quantize_activation_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(128, 16)) * 3, jnp.float32)
    cal = jnp.max(jnp.abs(x), axis=0)
    inv = (QMAX / cal).reshape(1, -1)
    q = quantize_activation(x, inv)
    assert q.dtype == jnp.int8
    deq = np.asarray(q, np.float32) * np.asarray(cal) / QMAX
    lsb = np.asarray(cal) / QMAX
    assert np.all(np.abs(deq - np.asarray(x)) <= 0.5 * lsb + 1e-7)


def test_merge_absmax_elementwise(tiny_mlp):
    params, x_enc, d_enc = tiny_mlp
    s1 = mlp_calibration_absmax(params, x_enc[:512], d_enc[:512])
    s2 = mlp_calibration_absmax(params, x_enc[512:], d_enc[512:])
    merged = merge_absmax(s1, s2)
    full = mlp_calibration_absmax(params, x_enc, d_enc)
    for got, want in zip(
        jax.tree_util.tree_leaves(merged), jax.tree_util.tree_leaves(full)
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_quant_mlp_tracks_float(tiny_mlp):
    params, x_enc, d_enc = tiny_mlp
    stats = mlp_calibration_absmax(params, x_enc, d_enc)
    qp = quantize_mlp(params, stats)
    pred_q = np.asarray(apply_nerf_mlp_quant(qp, x_enc, d_enc))
    pred_f = np.asarray(
        apply_nerf_mlp(params, x_enc, d_enc, compute_dtype=jnp.float32)[0]
    )
    # int8 noise bound: ~3% of the output abs-max at 8 layers deep.
    scale = np.abs(pred_f).max()
    assert np.abs(pred_q - pred_f).max() < 0.05 * max(scale, 1.0)
    rel_rmse = np.sqrt(np.mean((pred_q - pred_f) ** 2)) / pred_f.std()
    assert rel_rmse < 0.05


def test_skip_concat_heterogeneous_scales():
    """Columns from h4 (post-relu, one magnitude) and x_enc (raw xyz up
    to the scene bound, 40x larger) share one int8 matmul operand; the
    per-row folding must keep BOTH contributions accurate."""
    params = init_nerf_params(
        jax.random.PRNGKey(1), num_layers=6, hidden_dim=32, skip_layer=2,
        l_xyz=L_XYZ, l_dir=L_DIR,
    )
    rng = np.random.default_rng(1)
    # Huge positions: identity columns dominate the sin features 40:1.
    pts = jnp.asarray(rng.uniform(-40, 40, (1024, 3)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(1024, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    x_enc = encode_position(pts, L_XYZ)
    d_enc = encode_position(dirs, L_DIR)
    stats = mlp_calibration_absmax(params, x_enc, d_enc, skip_layer=2)
    qp = quantize_mlp(params, stats, skip_layer=2)
    pred_q = np.asarray(apply_nerf_mlp_quant(qp, x_enc, d_enc, skip_layer=2))
    pred_f = np.asarray(
        apply_nerf_mlp(
            params, x_enc, d_enc, compute_dtype=jnp.float32, skip_layer=2
        )[0]
    )
    rel_rmse = np.sqrt(np.mean((pred_q - pred_f) ** 2)) / pred_f.std()
    assert rel_rmse < 0.05


def test_flatten_qparams_layout(tiny_mlp):
    params, x_enc, d_enc = tiny_mlp
    qp = quantize_mlp(params, mlp_calibration_absmax(params, x_enc, d_enc))
    flat = flatten_qparams(qp)
    assert len(flat) == n_flat_qparams(8)
    assert all(f.ndim == 2 for f in flat)
    int8s = [f for f in flat if f.dtype == jnp.int8]
    assert len(int8s) == 8 + 3  # trunk + fs/branch/rgb weight matrices


def _ray_batch(b=64, s=16, seed=0):
    rng = np.random.default_rng(seed)
    origins = jnp.asarray(
        rng.uniform(-0.1, 0.1, (b, 3)) + [0, 0, 4], jnp.float32
    )
    dirs = jnp.asarray(
        rng.normal(size=(b, 3)) * 0.2 + [0, 0, -1], jnp.float32
    )
    t_vals = generate_t_vals(None, 2.0, 6.0, (b,), s, "center")
    return origins, dirs, t_vals


def test_quant_kernel_matches_jnp_reference(tiny_mlp):
    """The Pallas megakernel (interpret mode) vs the jnp quantized path.

    Both trace quant_forward_tile; the only numeric difference is the
    in-kernel Fourier encode's cos-phase trick (~1e-7 at these octaves),
    which can flip a borderline int8 rounding — hence the tiny but
    nonzero tolerance on the f32 outputs."""
    from nerf_keras_tpu.ops.pallas.quant_render import render_rays_fused_quant

    params, _, _ = tiny_mlp
    origins, dirs, t_vals = _ray_batch()
    pts, ds = sample_rays(origins, dirs, t_vals)
    x_enc = encode_position(pts, L_XYZ)
    d_enc = encode_position(ds, L_DIR)
    stats = mlp_calibration_absmax(params, x_enc, d_enc)
    qp = quantize_mlp(params, stats)

    pred_q = apply_nerf_mlp_quant(qp, x_enc, d_enc)
    rgb_j, _, w_j = volume_render(pred_q, t_vals)
    rgb_k, w_k = render_rays_fused_quant(
        qp, origins, dirs, t_vals, l_xyz=L_XYZ, l_dir=L_DIR
    )
    np.testing.assert_allclose(
        np.asarray(rgb_k), np.asarray(rgb_j), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_j), atol=1e-5)


def test_quant_kernel_vs_float_render(tiny_mlp):
    """Quant vs float through the full render: int8 noise bounds.

    Robust (quantile) bound: the 1e10 terminal delta makes the LAST
    sample's alpha a step function of sigma, so at near-zero sigma ANY
    perturbation (bf16 or int8) can flip isolated rays — trained models
    don't sit on that knife edge, and the e2e PSNR gate below covers
    them."""
    from nerf_keras_tpu.ops.pallas.fused_render import render_rays_fused
    from nerf_keras_tpu.ops.pallas.quant_render import render_rays_fused_quant

    params, _, _ = tiny_mlp
    origins, dirs, t_vals = _ray_batch(b=256)
    pts, ds = sample_rays(origins, dirs, t_vals)
    stats = mlp_calibration_absmax(
        params, encode_position(pts, L_XYZ), encode_position(ds, L_DIR)
    )
    qp = quantize_mlp(params, stats)
    rgb_q, _ = render_rays_fused_quant(
        qp, origins, dirs, t_vals, l_xyz=L_XYZ, l_dir=L_DIR
    )
    rgb_f, _ = render_rays_fused(
        params, origins, dirs, t_vals, l_xyz=L_XYZ, l_dir=L_DIR,
        compute_dtype=jnp.float32,
    )
    err = np.abs(np.asarray(rgb_q) - np.asarray(rgb_f))
    assert np.quantile(err, 0.95) < 0.02
    assert np.sqrt(np.mean(err**2)) < 0.05


def _tiny_trainer():
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer

    cfg = NeRFConfig(
        batch_size=64, ns_coarse=8, ns_fine=8, height=8, width=8,
        l_xyz=4, l_dir=2, num_layers=4, hidden_dim=32, skip_layer=4,
        compute_dtype="float32",
    )
    return Trainer(cfg, 2.0, 6.0), cfg


def test_trainer_quant_render(tmp_path):
    """Trainer-level int8 path: calibrate on a pose's rays, render the
    frame through the quantized kernel under the 8-device CPU mesh, and
    stay close to the float render."""
    from nerf_keras_tpu.ops.rays import pose_spherical

    trainer, cfg = _tiny_trainer()
    pose = pose_spherical(30.0, -30.0, 4.0)
    o, d = trainer.pose_rays(pose, cfg.height, cfg.width, 10.0)

    with pytest.raises(RuntimeError, match="quantize_for_inference"):
        trainer.render_rays(o, d, chunk=64, quant=True)

    trainer.quantize_for_inference(o, d)
    out_q = trainer.render_image(pose, cfg.height, cfg.width, 10.0,
                                 chunk=64, quant=True)
    out_f = trainer.render_image(pose, cfg.height, cfg.width, 10.0,
                                 chunk=64)
    assert out_q["rgb"].shape == (cfg.height, cfg.width, 3)
    assert np.isfinite(out_q["rgb"]).all() and np.isfinite(out_q["depth"]).all()
    err = np.abs(out_q["rgb"] - out_f["rgb"])
    assert np.sqrt(np.mean(err**2)) < 0.1

    with pytest.raises(ValueError, match="rgb/depth"):
        trainer.render_rays(o, d, chunk=64, quant=True, full=True)


def test_trainer_quant_xla_fallback_matches_pallas():
    """make_quant_render_fn dispatches on cfg.use_pallas: the XLA fallback
    (encode → apply_nerf_mlp_quant → volume_render) must agree with the
    Pallas quant megakernel at the trainer level — same integer pipeline,
    only the in-kernel cos-phase encode trick differs (~1e-7), which can
    flip a borderline int8 rounding, hence the small tolerance."""
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer
    from nerf_keras_tpu.ops.rays import pose_spherical

    arch = dict(
        batch_size=64, ns_coarse=8, ns_fine=8, height=8, width=8,
        l_xyz=4, l_dir=2, num_layers=4, hidden_dim=32, skip_layer=4,
        compute_dtype="float32",
    )
    tr_x = Trainer(NeRFConfig(use_pallas=False, **arch), 2.0, 6.0)
    tr_p = Trainer(NeRFConfig(use_pallas=True, **arch), 2.0, 6.0)
    # Same weights in both trainers.
    tr_p.state = tr_p.state._replace(params=tr_x.state.params)

    pose = pose_spherical(30.0, -30.0, 4.0)
    o, d = tr_x.pose_rays(pose, 8, 8, 10.0)
    tr_x.quantize_for_inference(o, d)
    tr_p.quantize_for_inference(o, d)

    out_x = tr_x.render_rays(o.reshape(-1, 3), d.reshape(-1, 3),
                             chunk=64, quant=True)
    out_p = tr_p.render_rays(o.reshape(-1, 3), d.reshape(-1, 3),
                             chunk=64, quant=True)
    for k in ("rgb_fine", "depth_fine", "rgb_coarse", "depth_coarse"):
        np.testing.assert_allclose(out_x[k], out_p[k], atol=2e-5,
                                   err_msg=k)


def test_trainer_quant_rejects_batch_norm():
    from nerf_keras_tpu.config import NeRFConfig
    from nerf_keras_tpu.engine.trainer import Trainer

    cfg = NeRFConfig(
        batch_size=64, ns_coarse=4, ns_fine=4, height=8, width=8,
        l_xyz=2, l_dir=1, num_layers=2, hidden_dim=16, batch_norm=True,
        use_pallas=False,
    )
    trainer = Trainer(cfg, 2.0, 6.0)
    with pytest.raises(ValueError, match="BatchNorm"):
        trainer.quantize_for_inference(
            np.zeros((8, 3), np.float32),
            np.tile(np.float32([0, 0, -1]), (8, 1)),
        )


def test_calibrate_render_covers_both_passes(tiny_mlp):
    params_one, _, _ = tiny_mlp
    from nerf_keras_tpu.config import NeRFConfig

    cfg = NeRFConfig(
        ns_coarse=8, ns_fine=8, l_xyz=L_XYZ, l_dir=L_DIR,
        num_layers=8, hidden_dim=64,
    )
    params = {"coarse": params_one, "fine": params_one}
    origins, dirs, _ = _ray_batch(b=32, s=cfg.ns_coarse)
    stats = calibrate_render(params, cfg, 2.0, 6.0, origins, dirs)
    assert set(stats) == {"coarse", "fine"}
    for s in stats.values():
        assert s["x_enc"].shape == (cfg.xyz_dim,)
        assert s["d_enc"].shape == (cfg.dir_dim,)
        assert len(s["h"]) == cfg.num_layers
        assert all(float(jnp.max(h)) > 0 for h in s["h"][:1])
    qrp = quantize_render_params(params, stats, cfg.skip_layer)
    assert set(qrp) == {"coarse", "fine"}
    assert qrp["fine"]["trunk"][0]["wq"].dtype == jnp.int8
