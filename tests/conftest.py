"""Test configuration: force CPU with 8 virtual devices (multi-chip sharding
tests run on a simulated mesh, per the driver's dryrun contract)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the axon sitecustomize force-sets jax_platforms='axon,cpu' AFTER env
# processing, so the env var alone is ignored — override via config
# before any backend initializes
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(11)
