"""Test harness: force an 8-device virtual CPU platform so sharding tests run
without TPU hardware (SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# Parity tests compare against torch float32; XLA:CPU's default conv/matmul
# algorithm is lower precision (~1e-3), so pin the highest-precision path for
# the whole test session. Production TPU code keeps the fast default.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
