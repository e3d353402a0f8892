#!/usr/bin/env bash
# Outage-hardened driver for the attention-variant A/B (VERDICT r4 #4).
#
# The axon relay HANGS (does not error) during outages, and tunnel compiles
# are minutes-slow, so a single monolithic attn_variants.py run can stall
# forever with zero captured rows. This driver runs ONE (stage, variant)
# cell per bounded subprocess; the persistent XLA compile cache means a
# timed-out attempt still banks its finished compiles, so retries converge.
# Captured cells are detected by their "RESULT N=<n> v<v>:" line and skipped.
set -u
cd "$(dirname "$0")/.."
OUT=${D2S_AB_OUT:-bench_results/r5/attn_ab.log}
CELL_TIMEOUT=${D2S_AB_CELL_TIMEOUT:-900}
PASSES=${D2S_AB_PASSES:-6}
mkdir -p "$(dirname "$OUT")"
touch "$OUT"

probe() {
    timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.bfloat16)
(x @ x).block_until_ready()
EOF
}

have() { grep -q "^RESULT N=$1 v$2:" "$OUT"; }

for pass in $(seq 1 "$PASSES"); do
    missing=0
    for N in 197 138 97 68; do
        for v in 0 1 2 3; do
            have "$N" "$v" && continue
            missing=1
            if ! probe; then
                echo "[pass $pass] tunnel down; waiting 60s" >> "$OUT"
                sleep 60
                continue
            fi
            echo "[pass $pass] N=$N v$v starting $(date -u +%H:%M:%S)" >> "$OUT"
            timeout "$CELL_TIMEOUT" python scripts/attn_variants.py \
                --stages "$N" --variants "$v" >> "$OUT" 2>&1
            echo "[pass $pass] N=$N v$v rc=$?" >> "$OUT"
        done
    done
    [ "$missing" = 0 ] && break
done
echo "attn A/B driver done $(date -u +%H:%M:%S)" >> "$OUT"
