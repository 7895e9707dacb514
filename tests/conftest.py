"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference only ever tests single-device CPU-vs-CUDA parity
(/root/reference/tests/test_droid_backends.py); here we additionally get a
multi-device environment for sharding tests by forcing the XLA host platform
to expose 8 devices. Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
