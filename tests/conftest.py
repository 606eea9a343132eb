"""Test harness: force an 8-device virtual CPU mesh.

jax.sharding semantics are identical on virtual CPU devices, so every
multi-chip code path (DP pjit step, sharded window batches) is
exercised here without TPU hardware.
"""

import os

# Must run before the first `import jax` anywhere in the test session.
# Note: under this image's axon TPU plugin the JAX_PLATFORMS env var is
# NOT honored — use JAX_PLATFORM_NAME and the in-process config knob.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
