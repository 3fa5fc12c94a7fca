"""Test harness: force an 8-device virtual CPU mesh (the JAX-native fake
backend for multi-chip tests) and full-precision matmuls so numerical parity
checks are meaningful.

NOTE: this environment pre-imports jax at interpreter startup (sitecustomize)
with JAX_PLATFORMS=axon, so env vars like XLA_FLAGS /
JAX_DEFAULT_MATMUL_PRECISION are ignored — configuration MUST go through
jax.config.update before the backend initialises."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
