"""Test harness: force the CPU backend with 8 virtual devices so sharding
logic is exercised without TPU hardware (SURVEY.md §4 item 5).

Note: this image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (remote TPU tunnel), so setting the env var here is too
late — use jax.config.update, which takes effect at backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
