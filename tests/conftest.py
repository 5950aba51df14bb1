"""Test configuration: force an 8-device virtual CPU mesh.

Must set XLA flags before jax initializes.  All tests run on CPU with 8
virtual devices so sharding/pjit paths are exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin prepends itself to jax_platforms at import time even
# when JAX_PLATFORMS=cpu is set; force CPU before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
