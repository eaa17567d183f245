"""Unit tests for the core ops against independent numpy derivations
(SURVEY.md §4: golden-value strategy the reference lacks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_keras_tpu.ops import (
    encode_position,
    generate_t_vals,
    get_rays,
    pose_spherical,
    sample_pdf,
    sample_rays,
    volume_render,
)
from nerf_keras_tpu.ops.encoding import encoded_width


# ---------------------------------------------------------------- encoding
def test_encode_dims():
    x = jnp.ones((4, 7, 3))
    assert encode_position(x, 10).shape == (4, 7, 63)
    assert encode_position(x, 4).shape == (4, 7, 27)
    assert encoded_width(3, 10) == 63


def test_encode_values_and_order(rng):
    """Feature layout must be [x, sin(2^0 x), cos(2^0 x), sin(2 x), ...]
    in 3-wide blocks (reference data_utils.py:17-21)."""
    x = rng.standard_normal((5, 3)).astype(np.float32)
    got = np.asarray(encode_position(jnp.asarray(x), 3))
    expected = [x]
    for i in range(3):
        expected.append(np.sin(2.0**i * x))
        expected.append(np.cos(2.0**i * x))
    np.testing.assert_allclose(got, np.concatenate(expected, -1), rtol=1e-6)


def test_encode_zero_freqs_identity():
    x = jnp.ones((2, 3))
    np.testing.assert_array_equal(np.asarray(encode_position(x, 0)), np.ones((2, 3)))


# ---------------------------------------------------------------- rays
def test_get_rays_identity_pose():
    h, w, f = 4, 6, 10.0
    pose = np.eye(4, dtype=np.float32)
    oris, dirs = get_rays(h, w, f, pose)
    assert oris.shape == (h, w, 3) and dirs.shape == (h, w, 3)
    np.testing.assert_allclose(np.asarray(oris), 0.0)
    # pixel (v=0, u=0): dir = ((0 - w/2)/f, -(0 - h/2)/f, -1)
    np.testing.assert_allclose(
        np.asarray(dirs)[0, 0], [(0 - w / 2) / f, (h / 2) / f, -1.0], rtol=1e-6
    )


def test_get_rays_rotation_translation(rng):
    h, w, f = 3, 5, 7.0
    # random rotation via QR
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    t = rng.standard_normal(3)
    pose = np.concatenate([q, t[:, None]], axis=1).astype(np.float32)
    oris, dirs = get_rays(h, w, f, pose)
    np.testing.assert_allclose(np.asarray(oris)[1, 2], t, rtol=1e-5, atol=1e-5)
    # manual: camera dir for pixel (v=1, u=2)
    cam = np.array([(2 - w / 2) / f, -(1 - h / 2) / f, -1.0])
    np.testing.assert_allclose(np.asarray(dirs)[1, 2], q @ cam, rtol=1e-5, atol=1e-5)


def test_sample_rays_points():
    oris = jnp.asarray([[0.0, 0, 0], [1, 1, 1]])
    dirs = jnp.asarray([[0.0, 0, -1], [0, 1, 0]])
    t = jnp.asarray([[1.0, 2.0], [0.5, 1.5]])
    pts, bdirs = sample_rays(oris, dirs, t)
    assert pts.shape == (2, 2, 3)
    np.testing.assert_allclose(np.asarray(pts)[0, 1], [0, 0, -2.0])
    np.testing.assert_allclose(np.asarray(pts)[1, 0], [1, 1.5, 1.0])
    np.testing.assert_allclose(np.asarray(bdirs)[1, 1], [0, 1, 0])


def test_pose_spherical_matches_composition():
    pose = pose_spherical(30.0, -45.0, 4.0)
    assert pose.shape == (4, 4)
    # camera sits at radius 4 from origin
    np.testing.assert_allclose(np.linalg.norm(pose[:3, 3]), 4.0, rtol=1e-5)
    # rotation block is orthonormal
    r = pose[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


# ---------------------------------------------------------------- volume
def test_volume_render_manual_two_samples():
    """Hand-computed tiny case incl. the 1e10 terminal delta and the
    epsilon inside the cumprod (data_utils.py:81-92)."""
    t = np.array([[1.0, 2.0]], dtype=np.float32)
    preds = np.array([[[0.0, 0.0, 0.0, 0.5], [10.0, -10.0, 0.0, 1.0]]], np.float32)
    rgb, depth, weights = volume_render(jnp.asarray(preds), jnp.asarray(t))

    delta = np.array([1.0, 1e10])
    sigma = np.array([0.5, 1.0])
    alpha = 1.0 - np.exp(-sigma * delta)
    trans = np.array([1.0, (1.0 - alpha[0] + 1e-10)])
    w = alpha * trans
    col = 1.0 / (1.0 + np.exp(-np.array([[0, 0, 0], [10, -10, 0.0]])))
    expected_rgb = (w[:, None] * col).sum(0)
    np.testing.assert_allclose(np.asarray(rgb)[0], expected_rgb, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(depth)[0], (w * t[0]).sum(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(weights)[0], w, rtol=1e-5)


def test_volume_render_zero_density_black():
    t = np.linspace(2, 6, 8, dtype=np.float32)[None].repeat(3, 0)
    preds = np.zeros((3, 8, 4), np.float32)
    preds[..., 3] = -100.0  # relu -> 0 density
    rgb, depth, weights = volume_render(jnp.asarray(preds), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(rgb), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(weights), 0.0, atol=1e-6)


def test_volume_render_opaque_first_sample():
    t = np.linspace(2, 6, 8, dtype=np.float32)[None]
    preds = np.zeros((1, 8, 4), np.float32)
    preds[0, 0, 3] = 1e6  # opaque wall at first sample
    rgb, depth, weights = volume_render(jnp.asarray(preds), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(weights)[0, 0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb)[0], 0.5, rtol=1e-5)  # sigmoid(0)
    np.testing.assert_allclose(np.asarray(depth)[0], 2.0, rtol=1e-5)


def test_volume_render_batch_shapes():
    """Arbitrary leading dims — generalization over the rank-2-only
    reference (data_utils.py:82)."""
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (2, 3, 5))
    preds = jnp.zeros((2, 3, 5, 4))
    rgb, depth, weights = volume_render(preds, t)
    assert rgb.shape == (2, 3, 3) and depth.shape == (2, 3) and weights.shape == (2, 3, 5)


# ---------------------------------------------------------------- sampling
def test_t_vals_center():
    t = generate_t_vals(None, 2.0, 6.0, (4,), 8, "center")
    assert t.shape == (4, 8)
    np.testing.assert_allclose(np.asarray(t)[0], np.linspace(2, 6, 8), rtol=1e-6)


def test_t_vals_stratified_bounds_and_variation():
    key = jax.random.PRNGKey(0)
    t = np.asarray(generate_t_vals(key, 2.0, 6.0, (16,), 8, "stratified"))
    base = np.linspace(2, 6, 8)
    assert (t >= base - 1e-6).all() and (t <= base + 0.5 + 1e-6).all()
    # per-ray jitter: rows differ (the whole point vs the reference)
    assert np.std(t[:, 0]) > 0
    # ascending per ray (bin width 0.5 < spacing 4/7)
    assert (np.diff(t, axis=-1) > 0).all()


def test_t_vals_shared_mode():
    key = jax.random.PRNGKey(1)
    t = np.asarray(generate_t_vals(key, 2.0, 6.0, (16,), 8, "shared"))
    # all rays identical (reference data_utils.py:131-137 semantics)
    assert np.allclose(t, t[0])
    assert not np.allclose(t[0], np.linspace(2, 6, 8))


def test_sample_pdf_concentrated_weights():
    """All mass in one bin -> all fine samples land in that bin."""
    key = jax.random.PRNGKey(2)
    s = 8
    t = np.linspace(2.0, 6.0, s, dtype=np.float32)[None].repeat(4, 0)
    t_mid = 0.5 * (t[:, 1:] + t[:, :-1])
    weights = np.full((4, s), 1e-12, np.float32)
    weights[:, 3] = 1.0
    samples = np.asarray(sample_pdf(key, jnp.asarray(t_mid), jnp.asarray(weights), 32))
    assert samples.shape == (4, 32)
    # weight bin 3 occupies cdf segment [3, 4] -> samples in t_mid[3..4]
    assert (samples >= t_mid[0, 3] - 1e-4).all()
    assert (samples <= t_mid[0, 4] + 1e-4).all()


def test_sample_pdf_uniform_weights_spread():
    key = jax.random.PRNGKey(3)
    s = 16
    t = np.linspace(0.0, 1.0, s, dtype=np.float32)[None].repeat(2, 0)
    t_mid = 0.5 * (t[:, 1:] + t[:, :-1])
    weights = np.ones((2, s), np.float32)
    samples = np.asarray(sample_pdf(key, jnp.asarray(t_mid), jnp.asarray(weights), 4096))
    # spread across the full [t_mid0, t_midN] range (exact distribution is
    # pinned by test_sample_pdf_matches_numpy_reference; the reference's
    # index clamping concentrates the final cdf segment on the last
    # midpoint, so no naive uniformity check here)
    assert samples.min() >= t_mid[0, 0] - 1e-6
    assert samples.max() <= t_mid[0, -1] + 1e-6
    assert samples.std() > 0.2


def test_sample_pdf_deterministic_mode():
    s = 8
    t_mid = np.linspace(0.0, 1.0, s - 1, dtype=np.float32)[None]
    weights = np.ones((1, s), np.float32)
    a = sample_pdf(jax.random.PRNGKey(0), jnp.asarray(t_mid), jnp.asarray(weights), 16, deterministic=True)
    b = sample_pdf(jax.random.PRNGKey(9), jnp.asarray(t_mid), jnp.asarray(weights), 16, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_pdf_matches_numpy_reference(rng):
    """Full golden-value check of the inverse-CDF math (incl. clamps and
    the 1e-5 floors, data_utils.py:179-220) against a numpy re-derivation
    using identical uniforms."""
    s, nf = 8, 16
    t = np.sort(rng.uniform(1.0, 5.0, (3, s)).astype(np.float32), axis=-1)
    t_mid = 0.5 * (t[:, 1:] + t[:, :-1])
    weights = rng.uniform(0.0, 1.0, (3, s)).astype(np.float32)

    key = jax.random.PRNGKey(7)
    got = np.asarray(sample_pdf(key, jnp.asarray(t_mid), jnp.asarray(weights), nf))

    u = np.asarray(jax.random.uniform(key, (3, nf), dtype=jnp.float32))
    w = weights + 1e-5
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((3, 1), np.float32), np.cumsum(pdf, -1)], -1)
    inds = np.stack([np.searchsorted(cdf[i], u[i], side="right") for i in range(3)])
    below = np.maximum(0, inds - 1)
    above = np.minimum(cdf.shape[-1] - 1, inds)
    cdf_b = np.take_along_axis(cdf, below, -1)
    cdf_a = np.take_along_axis(cdf, above, -1)
    tm_b = np.take_along_axis(t_mid, np.minimum(t_mid.shape[-1] - 1, below), -1)
    tm_a = np.take_along_axis(t_mid, np.minimum(t_mid.shape[-1] - 1, above), -1)
    denom = cdf_a - cdf_b
    denom = np.where(denom < 1e-5, 1.0, denom)
    expected = tm_b + (u - cdf_b) / denom * (tm_a - tm_b)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_sample_pdf_zero_fine_samples():
    """--ns-fine 0 (coarse-only rendering) must not divide by zero in the
    deterministic branch; it returns an empty draw."""
    t_mid = np.linspace(0.0, 1.0, 7, dtype=np.float32)[None]
    weights = np.ones((1, 8), np.float32)
    for det in (False, True):
        out = sample_pdf(
            jax.random.PRNGKey(0), jnp.asarray(t_mid), jnp.asarray(weights),
            0, deterministic=det,
        )
        assert out.shape == (1, 0)


def test_sample_pdf_degenerate_and_plateau_cases():
    """Edge cases for the one-hot einsum core: all-zero weights (uniform
    after the +1e-5 floor), mass in the FIRST and LAST bins (cdf plateaus
    at 0 and 1), and a re-derivation with identical uniforms."""
    s, nf = 8, 64
    t = np.linspace(2.0, 6.0, s, dtype=np.float32)[None]
    t_mid = 0.5 * (t[:, 1:] + t[:, :-1])

    def numpy_ref(weights, u):
        w = weights + 1e-5
        pdf = w / w.sum(-1, keepdims=True)
        cdf = np.concatenate(
            [np.zeros((w.shape[0], 1), np.float32), np.cumsum(pdf, -1)], -1
        )
        inds = np.stack(
            [np.searchsorted(cdf[i], u[i], side="right") for i in range(len(u))]
        )
        below = np.maximum(0, inds - 1)
        above = np.minimum(cdf.shape[-1] - 1, inds)
        cdf_b = np.take_along_axis(cdf, below, -1)
        cdf_a = np.take_along_axis(cdf, above, -1)
        tm = t_mid.repeat(len(u), 0)
        tm_b = np.take_along_axis(tm, np.minimum(tm.shape[-1] - 1, below), -1)
        tm_a = np.take_along_axis(tm, np.minimum(tm.shape[-1] - 1, above), -1)
        denom = cdf_a - cdf_b
        denom = np.where(denom < 1e-5, 1.0, denom)
        return tm_b + (u - cdf_b) / denom * (tm_a - tm_b)

    cases = [
        np.zeros((1, s), np.float32),                       # all-plateau pdf
        np.eye(s, dtype=np.float32)[0][None],               # mass in bin 0
        np.eye(s, dtype=np.float32)[-1][None],              # mass in last bin
        np.array([[0, 0, 1, 1, 0, 0, 0, 5]], np.float32),   # interior plateaus
    ]
    key = jax.random.PRNGKey(3)
    for weights in cases:
        got = np.asarray(
            sample_pdf(key, jnp.asarray(t_mid), jnp.asarray(weights), nf)
        )
        u = np.asarray(jax.random.uniform(key, (1, nf), dtype=jnp.float32))
        np.testing.assert_allclose(
            got, numpy_ref(weights, u), rtol=1e-4, atol=1e-5,
        )
        assert np.isfinite(got).all()


# ------------------------------------------------------------- NDC rays
def test_ndc_rays_inversion_property(rng):
    """Every point o' + t'*d' in NDC unprojects back onto the original
    world ray (published NDC derivation, NeRF paper appendix C), t'=0
    lands on the near plane, and t'->1 maps to infinity."""
    from nerf_keras_tpu.ops import ndc_rays

    h, w, f, near = 40, 60, 50.0, 1.0
    n = 64
    o = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5  # forward-facing: d_z < 0
    o_ndc, d_ndc = ndc_rays(h, w, f, near, jnp.asarray(o), jnp.asarray(d))
    o_ndc, d_ndc = np.asarray(o_ndc), np.asarray(d_ndc)

    # t'=0: origins sit on the near plane, which projects to z' = -1
    # (o_z = -near after the shift, so 1 + 2n/o_z = -1).
    np.testing.assert_allclose(o_ndc[:, 2], -1.0, atol=1e-5)

    for t_prime in (0.0, 0.3, 0.9):
        p = o_ndc + t_prime * d_ndc
        # Unproject: z = 2n/(p_z - 1); x = -p_x*(W/2)*z/f; y = -p_y*(H/2)*z/f
        z = 2.0 * near / (p[:, 2] - 1.0)
        x = -p[:, 0] * (w / 2.0) * z / f
        y = -p[:, 1] * (h / 2.0) * z / f
        world = np.stack([x, y, z], axis=-1)
        # Collinear with the original ray: (world - o) x d == 0.
        cross = np.cross(world - o, d)
        denom = np.linalg.norm(world - o, axis=-1) * np.linalg.norm(d, axis=-1)
        np.testing.assert_allclose(
            np.linalg.norm(cross, axis=-1) / np.maximum(denom, 1e-6),
            0.0, atol=1e-4,
        )
    # t'=0 unprojects exactly to the near plane z = -near.
    z0 = 2.0 * near / (o_ndc[:, 2] - 1.0)
    np.testing.assert_allclose(z0, -near, rtol=1e-5)


def test_ndc_rays_depth_ordering(rng):
    """t' in [0, 1) maps monotonically to world depth in [near, inf)."""
    from nerf_keras_tpu.ops import ndc_rays

    o = np.array([[0.1, -0.2, 0.0]], np.float32)
    d = np.array([[0.3, 0.1, -1.0]], np.float32)
    o_ndc, d_ndc = ndc_rays(32, 32, 30.0, 1.0, o, d)
    ts = np.linspace(0.0, 0.99, 10, dtype=np.float32)
    pz = np.asarray(o_ndc)[0, 2] + ts * np.asarray(d_ndc)[0, 2]
    depth = 2.0 / (pz - 1.0)  # world z (negative, toward -inf)
    assert (np.diff(depth) < 0).all()  # strictly receding
    assert depth[0] == pytest.approx(-1.0, rel=1e-5)


def test_dataset_to_ndc_bounds_and_shapes(rng):
    from nerf_keras_tpu.data.pipeline import RayDataset, dataset_to_ndc

    n = 12
    o = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    ds = RayDataset(
        pixels=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        origins=o, directions=d, near=1.2, far=9.0, focal=30.0,
        height=3, width=4,
    )
    out = dataset_to_ndc(ds)
    assert (out.near, out.far) == (0.0, 1.0)
    assert out.origins.shape == (n, 3) and out.directions.shape == (n, 3)
    assert np.isfinite(out.origins).all() and np.isfinite(out.directions).all()
    # NDC origins sit on the near plane: z' = -1.
    np.testing.assert_allclose(out.origins[:, 2], -1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# distortion_loss (beyond-reference geometry regularizer, Mip-NeRF 360)
# ---------------------------------------------------------------------------


def test_distortion_loss_matches_naive_double_sum():
    """The O(S) cumsum form equals the quadratic definition
    sum_ij w_i w_j |m_i - m_j| + (1/3) sum_i w_i^2 delta_i on sorted
    normalized midpoints."""
    from nerf_keras_tpu.ops import distortion_loss

    rng = np.random.default_rng(3)
    near, far = 2.0, 6.0
    t = np.sort(rng.uniform(near, far, (9, 13)), axis=-1)
    w = rng.uniform(0.0, 0.3, (9, 13))
    s = (t - near) / (far - near)
    delta = np.concatenate([s[:, 1:] - s[:, :-1], np.zeros((9, 1))], axis=-1)
    m = s + 0.5 * delta
    pair = np.array([
        np.sum(w[r][:, None] * w[r][None, :]
               * np.abs(m[r][:, None] - m[r][None, :]))
        for r in range(9)
    ])
    ref = float(np.mean(pair + np.sum(w ** 2 * delta, axis=-1) / 3.0))
    got = float(distortion_loss(jnp.asarray(t), jnp.asarray(w), near, far))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_distortion_loss_prefers_compact_mass():
    """A ray with its mass in one tight cluster must score lower than the
    same total mass split into two distant clusters (the anti-floater
    property the regularizer exists for)."""
    from nerf_keras_tpu.ops import distortion_loss

    t = jnp.linspace(2.0, 6.0, 32)[None, :]
    compact = jnp.zeros((1, 32)).at[0, 15:17].set(0.5)
    split = jnp.zeros((1, 32)).at[0, 2].set(0.5).at[0, 29].set(0.5)
    l_compact = float(distortion_loss(t, compact, 2.0, 6.0))
    l_split = float(distortion_loss(t, split, 2.0, 6.0))
    assert l_compact < l_split
    # and gradients flow into both weights and sample positions
    gw = jax.grad(lambda w: distortion_loss(t, w, 2.0, 6.0))(split)
    gt = jax.grad(lambda tv: distortion_loss(tv, split, 2.0, 6.0))(t)
    assert float(jnp.abs(gw).max()) > 0
    assert float(jnp.abs(gt).max()) > 0


def test_composite_background_math_and_grads():
    """rgb' = rgb + (1 - acc) * bkgd, and gradients flow into weights."""
    from nerf_keras_tpu.ops import composite_background

    rng = np.random.default_rng(4)
    rgb = jnp.asarray(rng.uniform(0, 1, (7, 3)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 0.1, (7, 13)).astype(np.float32))
    out = composite_background(rgb, w)
    want = np.asarray(rgb) + (1.0 - np.asarray(w).sum(-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)
    # fully opaque ray: unchanged; fully empty ray: white
    full = jnp.zeros((1, 13)).at[0, 0].set(1.0)
    np.testing.assert_allclose(
        np.asarray(composite_background(rgb[:1], full)), np.asarray(rgb[:1]),
        atol=1e-7,
    )
    empty = jnp.zeros((1, 13))
    np.testing.assert_allclose(
        np.asarray(composite_background(rgb[:1] * 0, empty)), 1.0, atol=1e-7
    )
    g = jax.grad(lambda w_: jnp.sum(composite_background(rgb, w_)))(w)
    np.testing.assert_allclose(np.asarray(g), -3.0, rtol=1e-6)  # -bkgd per channel


def test_sample_pdf_stratified_draws():
    """Stratified u: ascending per ray, one draw per CDF stratum, within
    the sample range — and distinct from the iid path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_keras_tpu.ops import sample_pdf

    rng = np.random.default_rng(0)
    b, s, nf = 8, 16, 12
    t = jnp.sort(jnp.asarray(
        rng.uniform(2.0, 6.0, size=(b, s)).astype(np.float32)), axis=-1)
    t_mid = 0.5 * (t[..., 1:] + t[..., :-1])
    w = jnp.asarray(rng.uniform(0, 1, size=(b, s)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    strat = np.asarray(sample_pdf(key, t_mid, w, nf, stratified=True))
    assert (np.diff(strat, axis=-1) >= -1e-6).all()  # ascending
    assert (strat >= float(t_mid.min()) - 1e-5).all()
    assert (strat <= float(t_mid.max()) + 1e-5).all()
    iid = np.asarray(sample_pdf(key, t_mid, w, nf, stratified=False))
    assert np.abs(strat - iid).max() > 1e-4
