"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py and the driver's compile checks, not by unit tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# NOTE: in this environment the axon TPU plugin ignores the JAX_PLATFORMS env
# var, so force CPU through the config API (verified to stick).
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite is dominated by XLA:CPU compiles of the
# same programs every run
jax.config.update("jax_compilation_cache_dir", "/tmp/hand3d_tpu_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
