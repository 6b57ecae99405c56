"""Test environment: force a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding / shard_map /
collective logic is exercised on 8 virtual CPU devices per SURVEY.md §4's
test plan.  Must run before the first ``import jax`` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not honored under the axon TPU tunnel; the config
# update is what actually pins the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from ncf_tpu.data.synthetic import generate_interactions  # noqa: E402


@pytest.fixture(scope="session")
def tiny_interactions():
    """Small synthetic log shared across tests (fast to generate)."""
    return generate_interactions(
        num_users=200, num_items=64, num_days=30,
        avg_txns_per_user=10, seed=7)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
