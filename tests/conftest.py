"""Test config: force CPU backend with 8 virtual devices for sharding tests.

Must set env before any jax backend initialization, hence module-level.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-registers the TPU backend and overwrites
# jax_platforms to "axon,cpu"; pin it back to cpu for the test suite.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
