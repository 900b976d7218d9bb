"""Test harness: run everything on a virtual 8-device CPU mesh.

Sharding/collective tests need multiple devices; TPU hardware is exercised
separately by bench.py and the driver's graft entry. Env vars must be set
before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override: the host env pins the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) calls
# jax.config.update("jax_platforms", "axon,cpu") at register time, overriding
# the env var — override it back so tests stay on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
