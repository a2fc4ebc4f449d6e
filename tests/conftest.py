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
# Persistent compile cache: the XLA CPU compiler has segfaulted mid-suite
# after ~100 tests' worth of compilations (cumulative process state); cached
# executables skip those compiles on re-runs and cut suite wall-clock on the
# single-core CI box.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/panovlm_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
