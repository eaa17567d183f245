"""Shared fixtures.  Platform pinning (virtual 8-device CPU) happens in the
early-load plugin ``nerf_keras_tpu.testing`` (see pytest.ini) — it must run
before anything initializes a JAX backend."""

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
