#!/bin/bash
# Cluster job template for a training run.
# Parity: the reference's SLURM template (sample_sbatch.sh) and log-tailing
# wrapper (run_display_patch_drop.sh) — adapted for a TPU VM: one host
# process drives the whole slice via SPMD (no mp.spawn / per-GPU processes).
#
#SBATCH --job-name=d2s-vit-tpu
#SBATCH --output=logs/%j.out
#SBATCH --time=24:00:00

set -euo pipefail
mkdir -p logs runs

# multi-host TPU slices: jax.distributed.initialize() picks up the TPU
# runtime topology automatically; single-host needs nothing.
python -m dense2sparse_vit_tpu.cli \
    --arch deit_small \
    --pruning-locs 3 6 9 \
    --keep-ratios 0.7 0.49 0.343 \
    --topk-selection \
    --use-fused-attention --dtype bfloat16 \
    --imgnet-val-dir "${IMAGENET_VAL_DIR:-/data/imagenet/val}" \
    --workdir "runs/${SLURM_JOB_ID:-local}" \
    "$@"
