#!/bin/bash
# Submit the attention patch-drop study and tail its log.
# Parity: run_display_patch_drop.sh (reference :8-23 waits for the SLURM log
# file to appear and tails it).
set -euo pipefail
mkdir -p logs

if command -v sbatch >/dev/null 2>&1; then
  JOB=$(sbatch --parsable --job-name=patch-drop --output=logs/%j.out \
    --wrap "python -m dense2sparse_vit_tpu.experiments.display_patch_drop $*")
  LOG="logs/${JOB}.out"
  echo "submitted job ${JOB}; waiting for ${LOG}"
  until [ -f "${LOG}" ]; do sleep 1; done
  tail -f "${LOG}"
else
  python -m dense2sparse_vit_tpu.experiments.display_patch_drop "$@"
fi
