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


def _fake_probe_run(cmd, env=None, timeout=None, **kw):
    assert "-c" in cmd, "only probes go through subprocess.run now"
    return types.SimpleNamespace(
        returncode=0, stdout="PROBE_OK 16384.0\n", stderr=""
    )


class _FakePopen:
    """Stands in for the measurement child: writes `lines` to the spool
    file, then returns `rc` from wait() — or raises TimeoutExpired when
    rc is None (a hung child)."""

    def __init__(self, lines, rc=0):
        self._lines, self._rc = lines, rc

    def __call__(self, cmd, stdout=None, env=None, **kw):
        assert env["_D2S_BENCH_CHILD"] == "1"
        for line in self._lines:
            stdout.write(line + "\n")
        stdout.flush()
        return self

    def wait(self, timeout=None):
        if self._rc is None:
            raise subprocess.TimeoutExpired("bench", timeout)
        return self._rc

    def kill(self):
        self._rc = -9


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
        return _fake_probe_run(cmd, env=env, timeout=timeout, **kw)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(
        bench.subprocess,
        "Popen",
        _FakePopen(["startup noise", json.dumps(payload)]),
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._parent_main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == payload
    assert calls["n"] == 2  # failed probe, good probe


def test_child_hang_is_bounded_and_reported(monkeypatch, capsys):
    """A bench child that hangs (relay died mid-run) is killed and logged."""
    bench = _load_bench(
        monkeypatch,
        {"D2S_BENCH_ATTEMPTS": "1", "D2S_BENCH_RETRY_SLEEP": "0"},
    )
    monkeypatch.setattr(bench.subprocess, "run", _fake_probe_run)
    monkeypatch.setattr(bench.subprocess, "Popen", _FakePopen([], rc=None))
    assert bench._parent_main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the probe succeeded, so this must NOT be attributed to an outage
    assert out["error"].startswith("bench run failed with backend reachable")
    assert "bench hang" in out["attempts"][0]


def test_partial_headline_survives_child_kill(monkeypatch, capsys):
    """VERDICT r4 weak #1: a child killed mid-extras must still yield the
    headline stage it already printed — a partial measurement beats rc 124
    with an empty tail."""
    bench = _load_bench(
        monkeypatch,
        {"D2S_BENCH_ATTEMPTS": "1", "D2S_BENCH_RETRY_SLEEP": "0"},
    )
    headline = {
        "metric": "m",
        "value": 13000.0,
        "unit": "images/sec/chip",
        "vs_baseline": 3.4,
    }
    monkeypatch.setattr(bench.subprocess, "run", _fake_probe_run)
    monkeypatch.setattr(
        bench.subprocess, "Popen", _FakePopen([json.dumps(headline)], rc=None)
    )
    assert bench._parent_main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] == 13000.0 and out["vs_baseline"] == 3.4
    assert "partial" in out["extra"]  # how far it got is recorded


def test_deadline_emits_error_without_running(monkeypatch, capsys):
    """With no wall-clock left, the parent emits the structured error line
    immediately instead of starting work it cannot finish."""
    bench = _load_bench(
        monkeypatch,
        {"D2S_BENCH_DEADLINE": "5", "D2S_BENCH_ATTEMPTS": "2"},
    )

    def boom(*a, **kw):  # no probe or child may launch
        raise AssertionError("deadline should preempt all subprocess work")

    monkeypatch.setattr(bench.subprocess, "run", boom)
    monkeypatch.setattr(bench.subprocess, "Popen", boom)
    assert bench._parent_main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] is None
    assert any("deadline" in a for a in out["attempts"])
