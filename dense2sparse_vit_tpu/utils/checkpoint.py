"""Orbax checkpoint save / restore / resume.

The reference has no working checkpoint saving (its best-checkpoint
torch.save is commented out, mask_predictor.py:317-318, and there is no
resume logic). This module provides both: periodic + best-metric saves of the
full TrainState and exact resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for TrainState pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self.best_metric: Optional[float] = None

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics
        )
        self._mgr.wait_until_finished()

    def save_if_best(self, step: int, state: Any, metric: float) -> bool:
        """Save when `metric` improves (higher is better); returns whether a
        save happened — the best-accuracy tracking of mask_predictor.py:313-318
        with the saving actually enabled."""
        if self.best_metric is None or metric > self.best_metric:
            self.best_metric = metric
            self.save(step, state, metrics={"best_metric": metric})
            return True
        return False

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `state_like` (an abstract or concrete
        TrainState)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like)
        )

    def close(self):
        self._mgr.close()
