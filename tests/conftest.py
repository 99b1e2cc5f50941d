"""Test configuration.

- Forces the CPU backend with 8 virtual devices so multi-chip sharding paths
  are exercised without TPU hardware (the standard JAX trick; SURVEY.md §4).
- Enables x64 so numerical parity checks against the f64 reference semantics
  are meaningful; dtype-stability tests flip precision locally.

Must run before jax initialises its backends, hence env mutation at import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's TPU relay plugin (axon) force-sets jax_platforms at
# interpreter startup; override it AFTER import so tests run on local CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
