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
  * when the axon TPU tunnel is configured but unreachable, the session
    fails fast with instructions instead of hanging in the plugin's
    connect-retry loop at the first jax.devices() (a down relay once cost a
    whole session's test budget). CPU fallback:
      env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/
"""

import os
import subprocess
import sys

import pytest


def _axon_tunnel_expected() -> bool:
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and (
        os.environ.get("JAX_PLATFORMS", "axon") == "axon"
    )


def pytest_sessionstart(session):
    if not _axon_tunnel_expected():
        return
    # sitecustomize registers the axon PJRT plugin at interpreter start; a
    # dead relay then blocks backend init forever. Probe in a subprocess
    # with a hard timeout — the probe also warms plugin discovery.
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=90, capture_output=True,
        )
    except subprocess.TimeoutExpired:
        raise pytest.UsageError(
            "axon TPU tunnel configured (PALLAS_AXON_POOL_IPS set) but "
            "jax.devices() hung >90s — the relay is down. Run on CPU with:\n"
            "  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu "
            "python -m pytest tests/"
        )


import jax

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: XLA compiles dominate test wall time; cache
# them across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")
