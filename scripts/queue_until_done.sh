#!/usr/bin/env bash
# Re-invoke the resumable perf queue until every entry has a real captured
# number for the current HEAD, or a global wall-clock deadline passes.
#
# Why: one queue pass runs each entry at most once; an entry that lands in
# a tunnel outage produces bench.py's structured {"value": null} line
# (rc=0 by design) and would otherwise never be retried this round. The
# queue's have_result() now rejects those logs, so looping the queue
# retries exactly the entries still missing a measurement.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${D2S_QUEUE_DEADLINE:-$(($(date +%s) + 21600))}   # default 6h
PASS=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    PASS=$((PASS + 1))
    echo "=== queue pass $PASS ($(date -u +%H:%M:%SZ)) ==="
    D2S_QUEUE_PROBE_BUDGET=${D2S_QUEUE_PROBE_BUDGET:-3600} \
        bash scripts/run_perf_queue.sh
    # done when every entry is captured (queue skips all six)
    missing=0
    for e in bench bench_train e2e_epoch roofline bench_zoo bench_serve; do
        ok=0
        # same perf-code keying as run_perf_queue.sh
        HEAD=$(git log -1 --format=%h -- \
            dense2sparse_vit_tpu bench.py bench_train.py bench_zoo.py \
            bench_serve.py scripts/e2e_epoch.py scripts/profile_roofline.py \
            __graft_entry__.py)
        HEAD=${HEAD:-$(git rev-parse --short HEAD)}
        for f in bench_results/r5/${e}_*.log; do
            [ -e "$f" ] || continue
            if grep -q "^head=$HEAD\$" "$f" && grep -q "^rc=0\$" "$f" \
                && ! grep -q '"value": *null' "$f"; then
                ok=1
            fi
        done
        [ "$ok" = 1 ] || { missing=$((missing + 1)); echo "still missing: $e"; }
    done
    if [ "$missing" = 0 ]; then
        echo "=== all entries captured after pass $PASS ==="
        exit 0
    fi
    sleep 120
done
echo "=== deadline reached with $missing entries missing ==="
exit 1
