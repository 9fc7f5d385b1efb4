"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU analogue of "test multi-node without a cluster": all sharding
tests run against 8 virtual CPU devices; the driver separately dry-run-compiles
the multi-chip path (see __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
