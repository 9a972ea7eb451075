"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU devices (the driver separately
dry-runs the multi-chip path); real-TPU behavior is covered by bench.py.
"""

import os

# Must be set before jax import anywhere in the test process. Note: the
# JAX_PLATFORMS env var alone is NOT honored by the axon TPU plugin in this
# image — the jax.config.update below is what actually forces CPU.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
