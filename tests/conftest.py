"""Test configuration: force CPU (8 virtual devices for sharding tests) + f64.

The axon TPU plugin ignores the JAX_PLATFORMS env var in this environment, so
the platform must be forced through jax.config before any computation.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False, help="run slow parity tests"
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: heavy fine-mesh parity tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow parity test; use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
