"""Test config: run JAX on the CPU backend with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (TPU tunnel); tests must run on
# the host CPU backend.  jax.config wins over the env var.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
