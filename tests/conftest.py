"""Test configuration.

Tests run on whatever JAX platform the environment provides (the real TPU
chip under axon, CPU elsewhere). Two adjustments:

  * float32 matmul precision is forced to "highest" so the MXU's default
    bfloat16 passes don't break the 1e-4 parity tolerances the suite inherits
    from the reference (/root/reference/tests/test_droid_backends.py:8). The
    production runtime chooses its own precision per op.
  * sharding / multi-device tests that need a virtual 8-device CPU mesh run
    themselves in a subprocess with JAX_PLATFORMS=cpu and
    --xla_force_host_platform_device_count=8 (see tests/test_parallel.py),
    because the platform must be chosen before JAX initialises.
"""

import jax

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: XLA compiles dominate test wall time; cache
# them across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")
