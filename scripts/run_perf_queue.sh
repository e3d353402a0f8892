#!/usr/bin/env bash
# On-chip perf capture queue (VERDICT r4 "Next round" #2).
#
# Everything that needs a driver-auditable on-chip number, in priority order:
#   1. bench.py           — headline inference metric (outage-hardened)
#   2. bench_train.py     — train-step sweep incl. cached-teacher rows
#   3. scripts/e2e_epoch.py — device-resident end-to-end epoch rows
#   4. scripts/profile_roofline.py — per-kernel MFU table
#   5. bench_zoo.py / bench_serve.py — zoo sweep + AOT serving-path numbers
#
# Resumable (VERDICT r4 weak #5): an entry is SKIPPED when a log for the
# current git HEAD already ends in rc=0 — so the queue can be re-run across
# short tunnel windows and only captures what is still missing. Progress is
# keyed on HEAD: change the code, and the entries re-measure.
#
# Probe behavior: instead of aborting on the first probe miss, the queue
# waits (bounded) for the tunnel to come back between entries.
set -u
cd "$(dirname "$0")/.."
OUT=${D2S_QUEUE_OUT:-bench_results/r5}
mkdir -p "$OUT"
# key captures on the last commit that touched the MEASURED code — docs/
# test-only commits must not invalidate an on-chip number (re-measuring
# after a README edit wastes a scarce tunnel window)
HEAD=$(git log -1 --format=%h -- \
    dense2sparse_vit_tpu bench.py bench_train.py bench_zoo.py \
    bench_serve.py scripts/e2e_epoch.py scripts/profile_roofline.py \
    __graft_entry__.py)
HEAD=${HEAD:-$(git rev-parse --short HEAD)}
STAMP=$(date -u +%Y%m%dT%H%M%SZ)
# total probe-wait budget across the whole queue run (seconds)
PROBE_BUDGET=${D2S_QUEUE_PROBE_BUDGET:-1800}

probe() {
    timeout 120 python - <<'EOF'
import jax, jax.numpy as jnp
print(jax.devices())
print("PROBE_OK", float(jnp.ones((128, 128)).sum()))
EOF
}

wait_for_tunnel() {
    # Returns 0 once a probe succeeds; burns from the shared PROBE_BUDGET.
    while true; do
        if probe; then return 0; fi
        if [ "$PROBE_BUDGET" -le 0 ]; then
            echo "probe budget exhausted; tunnel still down" >&2
            return 1
        fi
        echo "tunnel down; waiting 60s (budget ${PROBE_BUDGET}s left)" >&2
        sleep 60
        PROBE_BUDGET=$((PROBE_BUDGET - 180))
    done
}

have_result() {
    # rc=0 log for this entry at the current HEAD, holding a real number?
    # (bench.py exits 0 even for its structured {"value": null, "error":..}
    # outage line — that is a guaranteed-JSON artifact, not a measurement,
    # and must NOT mark the entry as captured)
    for f in "$OUT"/"$1"_*.log; do
        [ -e "$f" ] || return 1
        if grep -q "^head=$HEAD\$" "$f" 2>/dev/null \
            && grep -q "^rc=0\$" "$f" 2>/dev/null \
            && ! grep -q '"value": *null' "$f" 2>/dev/null; then
            return 0
        fi
    done
    return 1
}

run() {
    name=$1; budget=$2; shift 2
    if have_result "$name"; then
        echo "== $name == (skipped: rc=0 log for HEAD $HEAD exists)"
        return 0
    fi
    wait_for_tunnel || return 1
    echo "== $name =="
    log="$OUT/${name}_${STAMP}.log"
    echo "head=$HEAD" > "$log"
    timeout "$budget" "$@" >> "$log" 2>&1
    rc=$?
    echo "rc=$rc" >> "$log"
    tail -5 "$log"
}

# bench.py's own probe/retry budget must fit INSIDE its outer timeout, or a
# mid-run relay hang kills it before the guaranteed JSON line. The queue
# grants a LARGER deadline than the driver's default 420s: a queue pass is
# where the compile cache gets warmed for new kernel code (cold compiles of
# four configs can exceed 420s on this 1-core box), so that the driver's
# plain `python bench.py` later runs warm and fits easily.
export D2S_BENCH_PROBE_TIMEOUT=90 D2S_BENCH_RUN_TIMEOUT=1200
export D2S_BENCH_DEADLINE=1380
run bench        1500 python bench.py
# after a successful capture the cache is warm — prove the driver's exact
# invocation (default 420s deadline) also lands a number
if have_result bench && ! have_result bench_warm; then
    run bench_warm 600 env -u D2S_BENCH_DEADLINE -u D2S_BENCH_RUN_TIMEOUT \
        python bench.py
fi
run bench_train  1800 python bench_train.py
run e2e_epoch    1800 python scripts/e2e_epoch.py
run roofline     1800 python scripts/profile_roofline.py
run bench_zoo    1800 python bench_zoo.py
run bench_serve  1800 python bench_serve.py

# stamp the machine-readable summary the docs are generated from
python scripts/collect_measurements.py --dir "$OUT" || true
echo "queue done; artifacts in $OUT (stamp $STAMP, head $HEAD)"
