"""Test config: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on CPU with
``--xla_force_host_platform_device_count=8`` (the TPU-native analogue of the
reference's CPU-only unit tests, reference .travis.yml:36-37).

Note: the environment's sitecustomize registers the experimental 'axon' TPU
platform and overwrites JAX_PLATFORMS, so the env var alone is not enough —
we must also update jax.config before any backend is initialised.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
