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


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked slow (nightly lane; also RUN_SLOW=1)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (nightly lane; enable with --runslow or "
        "RUN_SLOW=1)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow: run with --runslow / RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
