"""Test config: force an 8-device virtual CPU mesh before jax is imported.

Multi-chip sharding tests run on CPU with
``--xla_force_host_platform_device_count=8`` (the TPU-native analogue of the
reference's CPU-only unit tests, reference .travis.yml:36-37).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
