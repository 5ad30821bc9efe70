"""Test harness: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin (sitecustomize) force-sets jax_platforms via jax.config,
so the JAX_PLATFORMS env var alone is not enough -- we must override the
config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
