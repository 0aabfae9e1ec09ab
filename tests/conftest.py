"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4: replaces multi-node testing).

jax may already be imported by the interpreter before conftest runs, so
env vars (JAX_PLATFORMS / XLA_FLAGS) are too late — use jax.config, which
takes effect as long as no backend has been initialized yet.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# fp32 matmuls for parity tests
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
