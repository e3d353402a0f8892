#!/usr/bin/env bash
# Round-4 on-chip perf recapture queue (VERDICT r3 "Next round" #2).
#
# Everything the round-3 outage left driver-unconfirmed, in priority order:
#   1. bench.py           — headline inference metric (outage-hardened)
#   2. bench_train.py     — train-step sweep incl. cached-teacher rows
#   3. scripts/e2e_epoch.py — device-resident end-to-end epoch rows
#   4. scripts/profile_roofline.py — per-kernel MFU table
#   5. bench_zoo.py / bench_serve.py — zoo sweep + AOT serving-path numbers
#
# Probes the tunnel first (bounded); every artifact lands under
# bench_results/r4/ with a timestamp so BENCHMARKS.md rows can be re-stamped
# as on-chip confirmed.
set -u
cd "$(dirname "$0")/.."
OUT=bench_results/r4
mkdir -p "$OUT"
STAMP=$(date -u +%Y%m%dT%H%M%SZ)

echo "== probe =="
if ! timeout 120 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print('PROBE_OK', float(jnp.ones((128,128)).sum()))"; then
    echo "tunnel down; aborting queue" >&2
    exit 2
fi

run() {
    name=$1; budget=$2; shift 2
    echo "== $name =="
    timeout "$budget" "$@" > "$OUT/${name}_${STAMP}.log" 2>&1
    rc=$?
    echo "rc=$rc" >> "$OUT/${name}_${STAMP}.log"
    tail -5 "$OUT/${name}_${STAMP}.log"
}

# bench.py's own probe/retry budget must fit INSIDE its outer timeout, or a
# mid-run relay hang kills it before the guaranteed JSON line: bound the
# child run at 900s and give the wrapper 3 attempts' worth of headroom
# (3 x (90s probe + 900s run) + sleeps ~= 3100s)
export D2S_BENCH_PROBE_TIMEOUT=90 D2S_BENCH_RUN_TIMEOUT=900
run bench        3300 python bench.py
run bench_train  1800 python bench_train.py
run e2e_epoch    1800 python scripts/e2e_epoch.py
run roofline     1800 python scripts/profile_roofline.py
run bench_zoo    1800 python bench_zoo.py
run bench_serve  1800 python bench_serve.py

echo "queue done; artifacts in $OUT (stamp $STAMP)"
