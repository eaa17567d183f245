"""SSIM metric: parity vs tf.image.ssim golden fixture + properties.

The fixture (tests/fixtures/ssim_golden.npz) is genuine tf.image.ssim
output — regenerate with scripts/make_ssim_fixture.py.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_keras_tpu.utils.image_metrics import ssim

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "ssim_golden.npz")


def _cases():
    raw = np.load(FIXTURE)
    names = sorted({k.split("__")[0] for k in raw.files})
    return [
        (n, raw[f"{n}__a"], raw[f"{n}__b"], float(raw[f"{n}__maxval"]),
         raw[f"{n}__ssim"])
        for n in names
    ]


@pytest.mark.parametrize("name,a,b,max_val,want", _cases(),
                         ids=[c[0] for c in _cases()])
def test_matches_tf_image_ssim(name, a, b, max_val, want):
    got = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b), max_val))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_identical_is_one_and_jits():
    a = jnp.asarray(np.random.default_rng(0).uniform(size=(20, 20, 3)),
                    jnp.float32)
    f = jax.jit(ssim)
    np.testing.assert_allclose(float(f(a, a)), 1.0, atol=1e-6)


def test_monotone_in_noise():
    rng = np.random.default_rng(7)
    a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    prev = 1.0
    for sigma in (0.02, 0.1, 0.3):
        b = np.clip(a + rng.normal(0, sigma, a.shape), 0, 1).astype(np.float32)
        cur = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        assert cur < prev, (sigma, cur, prev)
        prev = cur


def test_shape_validation():
    a = jnp.zeros((8, 8, 3))
    with pytest.raises(ValueError, match="smaller than"):
        ssim(a, a)
    with pytest.raises(ValueError, match="mismatch"):
        ssim(jnp.zeros((16, 16, 3)), jnp.zeros((16, 17, 3)))
