"""Test harness: force an 8-device virtual CPU platform before JAX loads.

This is JAX's standard fake-multichip mechanism (SURVEY.md §4) — sharding
and collective behavior is validated here without TPU hardware; the real
chip is exercised by bench.py and the driver's dryrun.
"""

import os

# Unconditional: the session environment may pin JAX_PLATFORMS=axon (the
# single real TPU); tests always run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = os.environ.get("NERF_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
