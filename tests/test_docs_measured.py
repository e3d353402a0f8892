"""Docs-vs-measurements consistency gate (VERDICT r4 "Next round" #8).

The round-4 failure mode was silent drift: BENCHMARKS.md claimed "no round-4
on-chip numbers exist" while a full rc=0 result sat in bench_results/r4/ in
the SAME commit. These tests pin the new contract: the measured-state blocks
in BENCHMARKS.md and README.md are machine-generated from
bench_results/MEASUREMENTS.json and must match a fresh render exactly.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MEASUREMENTS = os.path.join(REPO, "bench_results", "MEASUREMENTS.json")


def test_measurements_file_exists_and_parses():
    assert os.path.exists(MEASUREMENTS), (
        "bench_results/MEASUREMENTS.json missing — run "
        "scripts/collect_measurements.py after the perf queue"
    )
    with open(MEASUREMENTS) as f:
        data = json.load(f)
    assert "entries" in data and isinstance(data["entries"], dict)


def test_docs_match_measurements():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "render_benchmarks.py"),
         "--check"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=60,
    )
    assert r.returncode == 0, (
        "docs drifted from MEASUREMENTS.json — run "
        f"scripts/render_benchmarks.py:\n{r.stdout}{r.stderr}"
    )


def test_collector_parses_queue_log(tmp_path):
    """collect_measurements keeps the newest rc=0 result per entry and
    ignores failed/partial logs."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import collect_measurements as cm
    finally:
        sys.path.remove(os.path.join(REPO, "scripts"))
    good = {"metric": "m", "value": 1.5, "unit": "u", "vs_baseline": 2.0}
    (tmp_path / "bench_20260101T000000Z.log").write_text(
        "head=abc\nnoise\n" + json.dumps({"value": 0.1, "metric": "old"})
        + "\nrc=0\n"
    )
    (tmp_path / "bench_20260102T000000Z.log").write_text(
        "head=abc\n" + json.dumps(good) + "\nrc=0\n"
    )
    (tmp_path / "bench_train_20260102T000000Z.log").write_text(
        "head=abc\nwarning only, no JSON\nrc=1\n"
    )
    (tmp_path / "roofline_20260102T000000Z.log").write_text(
        "head=abc\n### dense fwd (device XLA-op time 29.10 ms total)\nrc=0\n"
    )
    entries = cm.collect(str(tmp_path))
    assert entries["bench"]["ok"] and entries["bench"]["results"][-1] == good
    assert entries["bench"]["stamp"] == "20260102T000000Z"
    assert not entries["bench_train"]["ok"]
    assert entries["roofline"]["ok"]
    assert entries["roofline"]["sections"] == [
        "dense fwd (device XLA-op time 29.10 ms total)"
    ]
