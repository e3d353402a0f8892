"""Collect on-chip benchmark logs into one machine-readable summary.

Single source of truth for measured performance (VERDICT r4 "Next round"
#8): scans a ``bench_results/<round>/`` directory for queue logs named
``<entry>_<stamp>.log``, keeps the NEWEST rc=0 result per entry, and writes
``bench_results/MEASUREMENTS.json``.  BENCHMARKS.md's headline table and the
README perf paragraph are regenerated from this file
(``scripts/render_benchmarks.py``), so docs can never again disagree with
the logs sitting in the same commit.

Log format (written by scripts/run_perf_queue.sh):
  head=<short git sha>     first line
  ... stdout/stderr ...    JSON result lines start with '{'
  rc=<exit code>           last line

Entries whose scripts print multiple JSON lines (bench_zoo) keep them all;
the roofline entry (markdown, no JSON) keeps its '###' summary lines.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

_LOG_RE = re.compile(
    r"^(?P<entry>[a-z][a-z0-9_]*)_(?P<stamp>\d{8}T\d{6}Z)\.log$"
)


def parse_log(path: str) -> dict:
    head = rc = None
    json_lines: list[dict] = []
    section_lines: list[str] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("head="):
                head = line[5:]
            elif line.startswith("rc="):
                try:
                    rc = int(line[3:])
                except ValueError:
                    pass
            elif line.startswith("{"):
                try:
                    json_lines.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
            elif line.startswith("###"):
                section_lines.append(line.lstrip("# "))
    return {
        "head": head,
        "rc": rc,
        "results": json_lines,
        "sections": section_lines,
    }


def collect(dirpath: str) -> dict:
    entries: dict[str, dict] = {}
    for name in sorted(os.listdir(dirpath)):
        m = _LOG_RE.match(name)
        if not m:
            continue
        rec = parse_log(os.path.join(dirpath, name))
        # a usable record needs rc=0 AND some payload
        ok = rec["rc"] == 0 and (rec["results"] or rec["sections"])
        prev = entries.get(m["entry"])
        newer = prev is None or m["stamp"] >= prev["stamp"]
        if ok and (newer or not prev.get("ok", False)) or (
            not ok and prev is None
        ):
            entries[m["entry"]] = {
                "ok": ok,
                "stamp": m["stamp"],
                "log": os.path.join(dirpath, name),
                **rec,
            }
    return entries


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="bench_results/r5")
    ap.add_argument("--out", default="bench_results/MEASUREMENTS.json")
    args = ap.parse_args(argv)
    entries = collect(args.dir)
    # merge: keep previously-collected entries from other rounds when the
    # current dir has no fresh rc=0 record for them
    merged = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f).get("entries", {})
    for k, v in entries.items():
        if v["ok"] or k not in merged:
            merged[k] = v
    out = {"source_dir": args.dir, "entries": merged}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    ok = sorted(k for k, v in merged.items() if v["ok"])
    missing = sorted(k for k, v in merged.items() if not v["ok"])
    print(f"collected {len(ok)} ok entries -> {args.out}: {', '.join(ok)}")
    if missing:
        print(f"still missing/failed: {', '.join(missing)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
