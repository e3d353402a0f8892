"""Driver-artifact guard tests for __graft_entry__.py.

Round-3 post-mortem: MULTICHIP_r03 went red (rc=124) because the parent
process of ``dryrun_multichip`` queried ``jax.devices()`` before deciding to
re-exec onto the CPU backend — and the ambient axon sitecustomize pins that
query to the TPU tunnel, which hangs through relay outages.  These tests pin
the fix: the parent must make its re-exec decision purely from the
environment (no JAX backend initialization at import or in the parent), and
the full dry run must pass end-to-end with the tunnel in ANY state.

Reference role being guarded: the "distributed check that runs anywhere"
(ddp_hello_world.py:190-200 is the reference's equivalent smoke test).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_extra: dict, timeout: int) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # simulate the ambient (armed) axon environment: the child-mark unset and
    # the sitecustomize trigger present, pointing at an unroutable relay so a
    # backend init would hang/fail rather than silently use a real device
    env.pop("_D2S_DRYRUN_MULTICHIP_CHILD", None)
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_import_does_not_touch_jax():
    """Importing __graft_entry__ must not import (let alone initialize) jax."""
    r = _run(
        "import sys; sys.path.insert(0, '.');"
        "import __graft_entry__;"
        "assert 'jax' not in sys.modules, 'jax imported at module scope';"
        "print('CLEAN')",
        {},
        timeout=60,
    )
    assert r.returncode == 0, r.stderr
    assert "CLEAN" in r.stdout


def test_parent_reexec_decision_is_env_only():
    """The parent path of dryrun_multichip must not initialize any backend.

    jax is replaced with a poison module whose every attribute access raises,
    and subprocess.run is intercepted to capture the env the parent builds
    for the child — so this checks both "parent never touches jax" and
    "child env is fully disarmed" without actually running the body.
    """
    code = (
        "import sys, types, os; sys.path.insert(0, '.');\n"
        "poison = types.ModuleType('jax')\n"
        "def _boom(*a, **k): raise AssertionError('parent touched jax backend')\n"
        "poison.devices = _boom\n"
        "poison.__getattr__ = lambda name: _boom\n"
        "sys.modules['jax'] = poison\n"
        "import subprocess\n"
        "captured = {}\n"
        "real_run = subprocess.run\n"
        "def fake_run(cmd, env=None, check=False, **kw):\n"
        "    captured['env'] = env\n"
        "    return types.SimpleNamespace(returncode=0)\n"
        "subprocess.run = fake_run\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "env = captured['env']\n"
        "assert env['_D2S_DRYRUN_MULTICHIP_CHILD'] == '1'\n"
        "assert env['JAX_PLATFORMS'] == 'cpu'\n"
        "assert 'PALLAS_AXON_POOL_IPS' not in env\n"
        "assert 'xla_force_host_platform_device_count=8' in env['XLA_FLAGS']\n"
        "print('ENVOK')\n"
    )
    r = _run(
        code,
        {"PALLAS_AXON_POOL_IPS": "203.0.113.1"},  # armed, unroutable
        timeout=60,
    )
    assert r.returncode == 0, r.stderr + r.stdout
    assert "ENVOK" in r.stdout


@pytest.mark.slow
def test_dryrun_multichip_end_to_end():
    """Full dryrun_multichip(8) through the real guard + body (~60-90s).

    Runs from a parent whose environment looks armed (PALLAS_AXON_POOL_IPS
    set to an unroutable address, JAX_PLATFORMS unset) — exactly the shape of
    the driver's environment during an axon outage. The guard must re-exec
    into the disarmed CPU env and the body must pass.
    """
    env_extra = {"PALLAS_AXON_POOL_IPS": "203.0.113.1"}
    # the driver's env has no JAX_PLATFORMS / test markers; scrub ours
    code = (
        "import sys, os; sys.path.insert(0, '.')\n"
        "for k in ('JAX_PLATFORMS', '_D2S_TPU_TEST_ENV_READY'):\n"
        "    os.environ.pop(k, None)\n"
        "os.environ['XLA_FLAGS'] = ''\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('DRYRUN_E2E_OK')\n"
    )
    r = _run(code, env_extra, timeout=540)
    assert r.returncode == 0, r.stderr + r.stdout
    assert "DRYRUN_E2E_OK" in r.stdout
