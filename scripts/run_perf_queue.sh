#!/usr/bin/env bash
# Round-4 on-chip perf recapture queue (VERDICT r3 "Next round" #2).
#
# Everything the round-3 outage left driver-unconfirmed, in priority order:
#   1. bench.py           — headline inference metric (outage-hardened)
#   2. bench_train.py     — train-step sweep incl. cached-teacher rows
#   3. scripts/e2e_epoch.py — device-resident end-to-end epoch rows
#   4. scripts/profile_roofline.py — per-kernel MFU table
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
    name=$1; shift
    echo "== $name =="
    timeout 1800 "$@" 2>&1 | tee "$OUT/${name}_${STAMP}.log"
}

run bench        python bench.py
run bench_train  python bench_train.py
run e2e_epoch    python scripts/e2e_epoch.py
run roofline     python scripts/profile_roofline.py

echo "queue done; artifacts in $OUT (stamp $STAMP)"
