"""Outage-resilience tests for bench.py's parent watchdog.

Round-3 post-mortem: BENCH_r03 recorded rc=1 with a raw RuntimeError
traceback because bench.py initialized the axon backend directly and had no
probe/retry — a transient relay error was indistinguishable from a real
outage, and a relay *hang* would have produced rc=124 with no information at
all. These tests pin the new contract: the parent process never touches JAX,
bounded probe+retry, and ONE parseable JSON line on every exit path.
"""

import importlib
import json
import os
import subprocess
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench(monkeypatch, env):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    sys.path.insert(0, REPO)
    try:
        import bench

        return importlib.reload(bench)
    finally:
        sys.path.remove(REPO)


def test_outage_emits_structured_error_json():
    """With the backend unreachable, bench.py exits 0 with an error JSON."""
    env = dict(os.environ)
    env.update(
        {
            # a platform jax cannot initialize -> probe fails fast on every
            # attempt, standing in for the hung/unavailable axon relay
            "JAX_PLATFORMS": "no_such_platform",
            "D2S_BENCH_PROBE_TIMEOUT": "60",
            "D2S_BENCH_ATTEMPTS": "2",
            "D2S_BENCH_RETRY_SLEEP": "0",
        }
    )
    env.pop("_D2S_BENCH_CHILD", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    line = r.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["error"].startswith("axon TPU backend unavailable")
    assert out["value"] is None and out["vs_baseline"] is None
    assert "images/sec/chip" in out["metric"]
    assert len(out["attempts"]) == 2


def test_success_json_forwarded_after_transient_failure(monkeypatch, capsys):
    """A transient probe failure is retried; the child's JSON is forwarded."""
    bench = _load_bench(
        monkeypatch,
        {"D2S_BENCH_ATTEMPTS": "3", "D2S_BENCH_RETRY_SLEEP": "0"},
    )
    payload = {"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 2.0}
    calls = {"n": 0}

    def fake_run(cmd, env=None, timeout=None, **kw):
        calls["n"] += 1
        if calls["n"] == 1:  # first probe: transient relay error
            raise subprocess.TimeoutExpired(cmd, timeout)
        if "-c" in cmd:  # later probes succeed
            return types.SimpleNamespace(
                returncode=0, stdout="PROBE_OK 16384.0\n", stderr=""
            )
        assert env["_D2S_BENCH_CHILD"] == "1"
        return types.SimpleNamespace(
            returncode=0,
            stdout="startup noise\n" + json.dumps(payload) + "\n",
            stderr="",
        )

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._parent_main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == payload
    assert calls["n"] == 3  # failed probe, good probe, child run


def test_child_hang_is_bounded_and_reported(monkeypatch, capsys):
    """A bench child that hangs (relay died mid-run) is killed and logged."""
    bench = _load_bench(
        monkeypatch,
        {"D2S_BENCH_ATTEMPTS": "1", "D2S_BENCH_RETRY_SLEEP": "0"},
    )

    def fake_run(cmd, env=None, timeout=None, **kw):
        if "-c" in cmd:
            return types.SimpleNamespace(
                returncode=0, stdout="PROBE_OK 16384.0\n", stderr=""
            )
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._parent_main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the probe succeeded, so this must NOT be attributed to an outage
    assert out["error"].startswith("bench run failed with backend reachable")
    assert "bench hang" in out["attempts"][0]
