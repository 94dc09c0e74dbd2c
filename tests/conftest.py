"""Test rig: force the CPU backend with 8 virtual devices.

The JAX-native way to test multi-chip sharding without a pod
(SURVEY.md §4 / §7 hard part #6): ``xla_force_host_platform_device_count=8``
gives 8 independent CPU devices for a ``('data', 'table')`` mesh; this file
must configure the flags before any test imports jax's backend.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# The image pins JAX_PLATFORMS=axon (the tunneled TPU); tests run on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
