"""Test configuration: force an 8-device virtual CPU mesh.

The JAX-native way to test multi-device SPMD without a cluster (replaces the
reference's single-node-multi-GPU smoke test, ddp_hello_world.py).

The ambient environment pins JAX to a single-chip TPU tunnel ('axon') via a
sitecustomize that runs at interpreter startup and initializes the XLA flag
parser — before any conftest — so mutating os.environ here is too late for
XLA_FLAGS to take effect. Instead, re-exec pytest once with a corrected
environment. The re-exec happens in pytest_configure with global capture
stopped, so the child's output reaches the real stdout.
"""

import os
import sys

_MARK = "_D2S_TPU_TEST_ENV_READY"


def _needs_reexec() -> bool:
    return os.environ.get(_MARK) != "1"


def _reexec_env() -> dict:
    env = dict(os.environ)
    env[_MARK] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    # prevents the axon sitecustomize from registering its TPU backend
    env.pop("PALLAS_AXON_POOL_IPS", None)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    return env


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        _reexec_env(),
    )
