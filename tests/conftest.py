"""Test bootstrap: force an 8-virtual-device CPU platform before jax init.

This is the rebuild's answer to the reference's CUDA-gated multi-GPU tests
(``yolov12/tests/test_cli.py:119``): every sharding/collective path is
exercised on a virtual CPU mesh, so distributed behavior is tested on any
machine (SURVEY.md §4 implications).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# env JAX_PLATFORMS can be force-set by site config; the config update wins
# as long as it happens before first backend use.
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-dominated (~40 min cold);
# cached reruns skip most of it
from kuzu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False, help="run slow tests"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="needs --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: opt-in long-running test")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
