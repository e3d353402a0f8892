"""Test configuration: force an 8-device virtual CPU mesh.

The JAX-native way to test multi-device SPMD without a cluster (replaces the
reference's single-node-multi-GPU smoke test, ddp_hello_world.py).
Must run before jax initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
