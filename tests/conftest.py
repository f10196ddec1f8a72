"""Test configuration: run JAX on a simulated 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding/pjit tests run
against XLA's host-platform device simulation.  Must be set before JAX is
imported anywhere in the test process.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS; switch back to the simulated-device CPU platform
# for tests (the env var alone is not enough).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    return REFERENCE
