#!/usr/bin/env bash
# Watch the axon tunnel; when it answers a bounded probe, run the round-4
# perf recapture queue (scripts/run_perf_queue.sh) exactly once.
#
# Probe cadence 600s (memory: outages are hours-long; short probes just hang
# for their full bound). Each probe is itself bounded at 90s.
set -u
cd "$(dirname "$0")/.."
LOG=bench_results/tunnel_watch.log
mkdir -p bench_results
echo "[$(date -u +%H:%M:%S)] watcher start" >> "$LOG"
while true; do
    if timeout 90 python -c "import jax, jax.numpy as jnp; jax.devices(); print('PROBE_OK', float(jnp.ones((128,128)).sum()))" >> "$LOG" 2>&1; then
        echo "[$(date -u +%H:%M:%S)] tunnel UP — running perf queue" >> "$LOG"
        bash scripts/run_perf_queue.sh >> "$LOG" 2>&1
        echo "[$(date -u +%H:%M:%S)] perf queue finished rc=$?" >> "$LOG"
        touch bench_results/QUEUE_DONE
        exit 0
    fi
    echo "[$(date -u +%H:%M:%S)] probe failed; sleeping 600s" >> "$LOG"
    sleep 600
done
