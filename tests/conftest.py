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
# The persistent-cache AOT loader logs a benign-but-huge E-level wall of
# text per hit on this host (XLA pseudo machine features like
# prefer-no-scatter are recorded at compile but unknown to host feature
# detection); silence XLA's C++ logging in tests.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compile cache: the suite is compile-bound (~19 min cold
# on this 1-core host); warm reruns — the runs that actually protect
# parity day-to-day — drop most of that. Keyed per-backend, so the CPU
# test cache shares the same dir the TPU entry points use.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser(
        os.environ.get("COUNTR_TPU_CACHE_DIR", "~/.cache/countr_tpu_xla")
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
