"""Test harness: force an 8-device virtual CPU mesh.

jax.sharding semantics are identical on virtual CPU devices, so every
multi-chip code path (DP pjit step, sharded window batches) is
exercised here without TPU hardware.
"""

import os

# Must run before the first `import jax` anywhere in the test session.
os.environ["JAX_PLATFORMS"] = "cpu"
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
