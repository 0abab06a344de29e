"""Test harness: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a fake CPU mesh (the standard JAX
technique — SURVEY.md §4c); real-TPU benchmarking happens in bench.py, not
in the test suite.

NOTE: in this environment jax is pre-imported at interpreter startup with
JAX_PLATFORMS=axon (remote TPU tunnel), so mutating os.environ here is too
late for jax's config snapshot — we must go through jax.config.update before
any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update(
    "jax_platforms", os.environ.get("GPS_TPU_TEST_PLATFORM", "cpu"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1314)  # the reference's seed (train_stage1.py:186)
