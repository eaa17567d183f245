"""Early-load pytest plugin: pin the test platform to virtual CPU devices.

Loaded via ``-p nerf_keras_tpu.testing`` in pytest.ini.

The sandbox's sitecustomize imports JAX and registers the axon TPU PJRT
plugin in *every* interpreter, so ``JAX_PLATFORMS`` is already read by the
time any pytest code runs.  As long as no backend has been *initialized*
yet (no ``jax.devices()`` call), the platform choice and XLA flags can
still be overridden via ``jax.config`` + env.  Tests then run on a virtual
8-device CPU platform (JAX's standard fake-multichip mechanism) so
sharding and collectives are exercised without TPU hardware.
"""

import os

_platform = os.environ.get("NERF_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (idempotent: sitecustomize already imported it)

jax.config.update("jax_platforms", _platform)
