"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU (the analog of the reference's scalar/LLVM variants,
src/conftest.py:29-62) so JIT semantics are exercised without TPU hardware;
the virtual device count lets sharding tests validate the multi-chip path.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def np_rng():
    return np.random.default_rng(seed=12345)
