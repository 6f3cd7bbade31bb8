"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic
(`shard_map` over a Mesh) is exercised without TPU hardware, mirroring how
the driver validates `dryrun_multichip`.  Must run before jax is imported.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # silence XLA AOT-cache noise
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The env var alone does not beat the preinstalled axon TPU plugin; force CPU
# explicitly so tests run on the 8 virtual devices.  NLSOLVER_TEST_TPU=1
# keeps the real device instead — for the two fused-kernel tests that have
# no CPU lowering (pltpu.prng_seed):
#   NLSOLVER_TEST_TPU=1 pytest tests/test_de_fused.py tests/test_de_batched.py
if not os.environ.get("NLSOLVER_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Solver literature (and the reference, which is double-only) assumes f64;
# tests validate numerics in both widths where it matters.  (Not on real
# TPU — no f64 hardware; the TPU mode only runs the fused-kernel tests.)
if not os.environ.get("NLSOLVER_TEST_TPU"):
    jax.config.update("jax_enable_x64", True)

# This box has 2 CPUs; XLA compiles dominate test time. Persist them.
# NLSOLVER_COMPILE_CACHE=0 disables the persistent cache (diagnostic
# switch).  Round-4 finding on THIS box: once ONE process has loaded
# ~500 XLA:CPU executables (compiled or cache-loaded), the next load can
# SEGFAULT inside jaxlib native code (reproduced at the same suite
# position with the cache on, off, and freshly wiped — never
# standalone; this box's jaxlib AOT bundle itself warns its machine
# features mismatch the host).  The suite crossed that size in round 4:
# ALWAYS run it as `pytest -n 2` (pytest-xdist; see CLAUDE.md) so each
# worker stays under the cliff — which also halves wall-clock.
if os.environ.get("NLSOLVER_COMPILE_CACHE", "1") != "0":
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/nlsolver_tpu_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(42)
