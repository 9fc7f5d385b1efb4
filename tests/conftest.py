"""Test harness: force an 8-device virtual CPU mesh.

This is the TPU analogue of "test multi-node without a cluster": all sharding
tests run against 8 virtual CPU devices; the driver separately dry-run-compiles
the multi-chip path (see __graft_entry__.dryrun_multichip).

NOTE: this environment's axon sitecustomize force-registers the TPU platform
and overrides the JAX_PLATFORMS env var, so we must ALSO flip the config after
import (before any backend use). XLA_FLAGS still must be set before import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fp32 matmuls must be exact for parity tests (TPU-style bf16 passes off).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)
