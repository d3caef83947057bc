"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on the forced-host-platform device mesh; the
driver separately dry-runs `__graft_entry__.dryrun_multichip` the same way.
f64 is enabled so analytic-Jacobian / solver parity tests can compare against
high-precision references (the production path stays f32 on TPU).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image; the
# config update reliably forces the host platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
