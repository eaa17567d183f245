"""Parity tests for the experimental (NOT wired) pdf+union kernel.

The kernel lives in experimental/pdf_union.py — a measured negative
result (5.65 ms vs 4.66 ms for the XLA chain at the flagship chunk;
docs/PERF.md round 3).  These tests keep the recorded implementation
honest without shipping it in the production package.
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_pdf_union_eval_kernel_matches_jnp_chain():
    """The fused eval pdf+union kernel must reproduce
    sorted_union(t, sample_pdf(deterministic)) bit-for-bit numerics-wise,
    including plateau weights, near-opaque rays, and ray padding."""
    from nerf_keras_tpu.ops import sample_pdf, sorted_union
    from experimental.pdf_union import sample_pdf_union_eval

    rng = np.random.default_rng(9)
    b, s, nf = 20, 16, 8  # b=20 exercises ray padding at tile 24
    t = jnp.sort(
        jnp.asarray(rng.uniform(2.0, 6.0, size=(b, s)).astype(np.float32)),
        axis=-1,
    )
    w = jnp.asarray(rng.uniform(0, 1, size=(b, s)).astype(np.float32))
    # adversarial rows: all-zero weights (uniform pdf via the 1e-5 floor),
    # single-spike (plateau cdf), and front-loaded mass
    w = w.at[0].set(0.0)
    w = w.at[1].set(jnp.zeros(s).at[s // 2].set(5.0))
    w = w.at[2].set(jnp.concatenate([jnp.ones(2), jnp.zeros(s - 2)]))

    t_mid = 0.5 * (t[..., 1:] + t[..., :-1])
    t_fine = sample_pdf(None, t_mid, w, nf, deterministic=True)
    ref = sorted_union(t, t_fine)

    got = sample_pdf_union_eval(t, w, nf, tile_rays=24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # ascending per ray
    assert (np.diff(np.asarray(got), axis=-1) >= -1e-6).all()


def test_pdf_union_eval_kernel_flagship_shape():
    """Flagship S=64/NF=128 shapes run through the kernel (interpret mode)
    and match the jnp chain."""
    from nerf_keras_tpu.ops import sample_pdf, sorted_union
    from experimental.pdf_union import sample_pdf_union_eval

    rng = np.random.default_rng(3)
    b, s, nf = 16, 64, 128
    t = jnp.sort(
        jnp.asarray(rng.uniform(2.0, 6.0, size=(b, s)).astype(np.float32)),
        axis=-1,
    )
    w = jnp.asarray(rng.uniform(0, 1, size=(b, s)).astype(np.float32) ** 3)

    t_mid = 0.5 * (t[..., 1:] + t[..., :-1])
    ref = sorted_union(t, sample_pdf(None, t_mid, w, nf, deterministic=True))
    got = sample_pdf_union_eval(t, w, nf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pdf_union_train_sorted_u_matches_xla_chain():
    """Training path: drawing sample_pdf's exact uniforms, sorting them,
    and running the fused kernel reproduces sorted_union(t, sample_pdf)
    bit-for-bit — sorting iid u preserves the fine-sample multiset and
    only the union is consumed downstream."""
    from nerf_keras_tpu.ops import sample_pdf, sorted_union
    from experimental.pdf_union import sample_pdf_union

    rng = np.random.default_rng(17)
    b, s, nf = 24, 16, 8
    t = jnp.sort(
        jnp.asarray(rng.uniform(2.0, 6.0, size=(b, s)).astype(np.float32)),
        axis=-1,
    )
    w = jnp.asarray(rng.uniform(0, 1, size=(b, s)).astype(np.float32))
    w = w.at[0].set(0.0)  # degenerate row through the random-u path too

    key = jax.random.PRNGKey(5)
    t_mid = 0.5 * (t[..., 1:] + t[..., :-1])
    ref = sorted_union(t, sample_pdf(key, t_mid, w, nf))

    u = jnp.sort(jax.random.uniform(key, (b, nf), dtype=jnp.float32), axis=-1)
    got = sample_pdf_union(t, w, nf, u_sorted=u, tile_rays=24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

