"""Test harness setup.

Tests run on CPU with 8 virtual XLA devices so `jax.sharding.Mesh`
multi-chip code paths are exercised without TPU hardware (the strategy
SURVEY.md §4 prescribes). The env var JAX_PLATFORMS alone is not enough on
this machine (a TPU platform plugin overrides it), so we force the platform
through jax.config before any test imports jax functionality.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
