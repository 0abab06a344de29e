"""Test harness: force an 8-device virtual CPU platform before jax loads.

Multi-chip sharding is validated on a fake CPU mesh (the standard JAX
technique — SURVEY.md §4c); real-TPU benchmarking happens in bench.py, not
in the test suite.
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("GPS_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1314)  # the reference's seed (train_stage1.py:186)
