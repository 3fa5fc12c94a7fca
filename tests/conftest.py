"""Test harness: force an 8-device virtual CPU mesh (the JAX-native fake
backend for multi-chip tests) and full-precision matmuls so numerical parity
checks are meaningful. Must run before jax initialises."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "float32")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Env var alone is unreliable under pytest (a plugin may import jax first);
# set the config explicitly so parity tests compare true-fp32 matmuls.
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
