"""Test harness config: run everything on an 8-virtual-device CPU platform so
multi-chip sharding paths (shard_map over a Mesh) are exercised without TPU
hardware. Must set flags before the first jax import anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env may point at a TPU plugin
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual-CPU platform"


@pytest.fixture
def rng():
    """Seeded numpy Generator — mirrors the reference's fixed-seed test fixtures
    (test/character_solver/error_function_helpers.h:22-53, seed 12345)."""
    return np.random.default_rng(12345)
