"""Test harness: force an 8-virtual-device CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4).

Note: the axon TPU plugin on this image force-appends itself to
jax_platforms, overriding the JAX_PLATFORMS env var, so we must also update
the config after importing jax."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
