"""Smoke test for bench_serve.py: the AOT-serving benchmark must run end to
end on CPU (tiny model) and emit one parseable JSON line with a sane
exported-vs-live ratio — the serving-deployment measurement the reference
never had (its closest analogue is evaluate.py's research-side timing)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_smoke_emits_json_line():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_serve.py"), "--smoke"],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["unit"] == "images/sec/chip"
    assert out["value"] > 0
    # the exported artifact runs the same StableHLO as the live jit, so the
    # ratio is ~1.0 on a quiet machine — but the smoke model is sub-ms per
    # call, so on a loaded 1-core box the min-of-repeats still jitters by
    # several ×; assert only that the ratio is a sane finite number
    assert 0.02 < out["vs_baseline"] < 50.0
    extra = out["extra"]
    assert extra["artifact_bytes"] > 0
    assert set(extra["per_batch"]) == {"B=1", "B=4"}
    for row in extra["per_batch"].values():
        assert row["images_per_sec"] > 0
