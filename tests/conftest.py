"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py and the driver's compile checks, not by unit tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU collective rendezvous hard-kills the process (LOG(FATAL),
# rendezvous.cc "Termination timeout ... exceeded. Exiting to ensure a
# consistent program state") when a participant thread doesn't arrive
# within 40 s. Eight virtual device threads time-slicing this image's
# SINGLE physical core can starve one participant past that under load —
# observed as rc=134 suite aborts in mesh tests (docs/DESIGN.md,
# "all gather may be stuck"). The stall is scheduling, not deadlock:
# give stragglers 15 min before the fatal, and keep the warn at 20 s so
# genuine hangs still log early.
if "collective_call_terminate_timeout" not in flags:
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=900"
os.environ["XLA_FLAGS"] = flags

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


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute end-to-end gates (deselect with -m 'not slow')",
    )


@pytest.fixture
def rng():
    return np.random.RandomState(0)
