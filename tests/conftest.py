"""Test configuration: force CPU (8 virtual devices for sharding tests) + f64.

The axon TPU plugin ignores the JAX_PLATFORMS env var in this environment, so
the platform must be forced through jax.config before any computation.

On-device gate: ``HOMMX_TEST_TPU=1 python -m pytest tests/test_runtpu.py
--runtpu -q`` keeps the real TPU backend (no CPU forcing) and runs the
``runtpu``-marked kernel-equivalence tests on real Mosaic — the regression
net for divergences that interpreter-mode CPU tests cannot see (round-3
verdict item 7; e.g. the int64-poison Mosaic bug of commit 9c97469 was
caught by a bench anomaly, not a test).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if not os.environ.get("HOMMX_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False, help="run slow parity tests"
    )
    parser.addoption(
        "--runtpu", action="store_true", default=False,
        help="run on-device Pallas kernel gates (needs HOMMX_TEST_TPU=1 "
             "and a TPU backend)",
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: heavy fine-mesh parity tests")
    config.addinivalue_line(
        "markers", "runtpu: on-device (real Mosaic) kernel equivalence gates"
    )


def pytest_collection_modifyitems(config, items):
    skips = []
    if not config.getoption("--runslow"):
        skips.append(
            ("slow", pytest.mark.skip(reason="slow parity test; use --runslow"))
        )
    if not config.getoption("--runtpu"):
        skips.append(
            ("runtpu", pytest.mark.skip(
                reason="on-device gate; use HOMMX_TEST_TPU=1 ... --runtpu"
            ))
        )
    for item in items:
        for name, mark in skips:
            if name in item.keywords:
                item.add_marker(mark)
