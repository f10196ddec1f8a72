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

# Persistent XLA compilation cache: the suite's wall time is dominated by
# re-compiling near-identical train/eval graphs (distinct jit closures
# don't share the in-process trace cache, but they DO share this disk
# cache, which keys on the HLO hash).  Safe on the CPU platform; the
# axon-backend hang documented in docs/tpu_notes.md does not apply here.
_CACHE_DIR = os.environ.get("FASTSPEECH2_TPU_TEST_JIT_CACHE",
                            "/tmp/fastspeech2_tpu_test_jit_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    return REFERENCE
