"""Metrics logging: stdout + JSONL + optional TensorBoard + optional wandb.

Parity: the reference's three channels (SURVEY.md section 5.5) — wandb when
--wandb (mask_predictor.py:120-133,320-327), TensorBoard in the DDP path
(ddp_training.py:57,186-188), and stdout prints throughout. All sinks are
host-0 gated under SPMD (replacing rank-0 blocks, ddp_training.py:178-211).
wandb is gated on import availability (not installed in this image).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax


class MetricsLogger:
    def __init__(
        self,
        workdir: str,
        job_name: str = "run",
        use_tensorboard: bool = False,
        use_wandb: bool = False,
        wandb_config: Optional[dict] = None,
    ):
        self.primary = jax.process_index() == 0
        self.workdir = workdir
        self.job_name = job_name
        self._tb = None
        self._wandb = None
        self._jsonl = None
        if not self.primary:
            return
        os.makedirs(workdir, exist_ok=True)
        self._jsonl = open(os.path.join(workdir, "metrics.jsonl"), "a")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(workdir, "tb"))
            except Exception as e:  # pragma: no cover - env dependent
                print(f"tensorboard unavailable ({e}); skipping")
        if use_wandb:
            try:  # pragma: no cover - not installed in this image
                import wandb

                self._wandb = wandb
                wandb.init(
                    project="dense2sparse-vit-tpu", name=job_name,
                    config=wandb_config or {},
                )
            except Exception as e:
                print(f"wandb unavailable ({e}); skipping")

    def log(self, metrics: Dict[str, float], step: int, prefix: str = ""):
        if not self.primary:
            return
        flat = {
            (f"{prefix}/{k}" if prefix else k): float(v)
            for k, v in metrics.items()
        }
        record = {"step": step, "time": time.time(), **flat}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in flat.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(flat, step=step)
        line = " ".join(f"{k}={v:.4f}" for k, v in flat.items())
        print(f"[{self.job_name} step {step}] {line}")

    def summary(self, metrics: Dict[str, float]):
        if not self.primary:
            return
        if self._wandb is not None:
            for k, v in metrics.items():
                self._wandb.run.summary[k] = v
        with open(os.path.join(self.workdir, "summary.json"), "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f, indent=2)

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


def slurm_job_name(cfg) -> str:
    """Derived job name encoding the key hyperparameters, in the spirit of
    the reference's SLURM/wandb naming (mask_predictor.py:71-133)."""
    pr = cfg.pruning
    parts = [
        cfg.arch,
        f"L{'-'.join(map(str, pr.pruning_locs))}",
        f"K{'-'.join(f'{r:g}' for r in pr.keep_ratios)}",
        pr.selection,
        pr.mask_loss_type,
    ]
    if pr.patch_score_threshold is not None:
        parts.append(f"th{pr.patch_score_threshold:g}")
    if pr.small_predictor:
        parts.append("sMP")
    if pr.predictor_bn:
        parts.append("bn")
    job_id = os.environ.get("SLURM_JOB_ID")
    if job_id:
        parts.append(job_id)
    return "_".join(parts)
