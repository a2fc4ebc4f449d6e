"""Test config: force CPU backend with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY.md §7 / task environment contract)."""

import os

# Must be set before the CPU PJRT client is created. Note: this image's
# sitecustomize pre-registers a TPU backend with JAX_PLATFORMS=axon, so the
# env var alone is not enough — jax.config.update('jax_platforms', ...) is
# what actually forces CPU here.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
