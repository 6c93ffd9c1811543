"""Test session config: run JAX on an 8-virtual-device CPU platform.

Multi-chip sharding (pjit/shard_map over a Mesh) is exercised without a
TPU pod by forcing 8 host CPU devices (SURVEY.md §4.4). Must run before
jax is imported anywhere in the test process.
"""

import os
import sys

# The axon TPU plugin registers itself from sitecustomize.py at interpreter
# startup — before conftest runs — and its JAX_PLATFORMS=axon env wins over
# anything set later. Backend *initialization* is lazy though, so flipping
# the config to cpu here (before any jax.devices()/computation) forces the
# whole test session onto the virtual-device CPU platform instead of the
# tunneled TPU (~1s per eager dispatch there).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
