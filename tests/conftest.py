"""Test configuration: run the suite on a virtual 8-device CPU mesh with x64.

Correctness tests use float64 on the CPU backend (TPU v5e has no native f64;
the f64 tier mirrors the reference's 1e-8 parity tier,
/root/reference/tests/conftest.py:113).  Multi-device tests use the 8 virtual
CPU devices, the analog of the reference's ``mpirun --oversubscribe -np 4``
trick (/root/reference/tests/test_python_repro_allegro.py:153-157).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# Force the CPU backend: the ambient environment's axon TPU plugin calls
# jax.config.update("jax_platforms", "axon,cpu") from sitecustomize, which
# OVERRIDES the JAX_PLATFORMS env var — so we must override at the config
# layer, after `import jax` but before any backend initializes.  Correctness
# tests need f64 + fast iteration; set PAT_TEST_TPU=1 to run on the TPU.
if not os.environ.get("PAT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    # f64 tier only exists on CPU; under the TPU tier x64 stays OFF — the
    # chip has no f64 and x64-typed index maps fail Mosaic lowering.  The
    # TPU tier is the kernel/e2e gate: run it on the kernel test files
    # (PAT_TEST_TPU=1 pytest tests/test_stack_fused.py); f64-oracle tests
    # are covered by the CPU run and skip on TPU.
    jax.config.update("jax_enable_x64", True)
# the suite is compile-bound (f64 model + grad graphs); persist compiled
# executables across tests and runs
jax.config.update("jax_compilation_cache_dir", "/tmp/pat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
