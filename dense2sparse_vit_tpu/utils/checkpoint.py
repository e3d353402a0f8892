"""Orbax checkpoint save / restore / resume.

The reference has no working checkpoint saving (its best-checkpoint
torch.save is commented out, mask_predictor.py:317-318, and there is no
resume logic). This module provides both, as TWO streams under one
directory:

  <dir>/best/   — best-val-metric saves (the deployable checkpoint)
  <dir>/latest/ — every-epoch saves, so --resume is EXACT: if accuracy
                  plateaus for many epochs, resume continues from the last
                  epoch instead of silently re-training the plateau from
                  the last best

Resume restores the highest step across both streams (they may tie at the
same step; the latest stream wins the lookup, contents are identical).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Dual-stream (best + latest) orbax manager for TrainState pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._best = ocp.CheckpointManager(
            os.path.join(self.directory, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                # best_fn makes orbax PERSIST per-step metrics (it drops
                # them otherwise), which the resume path below reads to
                # seed best_metric; GC then also keeps the top-N by metric
                best_fn=lambda m: m["best_metric"],
                best_mode="max",
            ),
        )
        self._latest = ocp.CheckpointManager(
            os.path.join(self.directory, "latest"),
            options=ocp.CheckpointManagerOptions(max_to_keep=2, create=True),
        )
        # resume must not forget the historical best: a fresh manager with
        # best_metric=None would let the FIRST post-resume eval overwrite
        # the best-stream checkpoint with a worse one
        self.best_metric: Optional[float] = None
        bs = self._best.latest_step()
        if bs is not None:
            try:
                m = self._best.metrics(bs)
                if m and m.get("best_metric") is not None:
                    self.best_metric = float(m["best_metric"])
            except Exception:
                pass

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        """Save into the latest-epoch stream (called every epoch).

        Idempotent per step: an epoch that produced zero train steps (e.g. a
        split smaller than the batch) re-saves the same step number, which
        orbax rejects with StepAlreadyExistsError — skip instead."""
        if step in self._latest.all_steps():
            return
        self._latest.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics
        )
        self._latest.wait_until_finished()

    def save_if_best(self, step: int, state: Any, metric: float) -> bool:
        """Save into the best stream when `metric` improves (higher is
        better); returns whether a save happened — the best-accuracy
        tracking of mask_predictor.py:313-318 with the saving actually
        enabled."""
        if self.best_metric is None or metric > self.best_metric:
            self.best_metric = metric
            self._best.save(
                step,
                args=ocp.args.StandardSave(state),
                metrics={"best_metric": metric},
            )
            self._best.wait_until_finished()
            return True
        return False

    def latest_step(self) -> Optional[int]:
        """Highest step across both streams (what --resume restores)."""
        steps = [
            s
            for s in (self._best.latest_step(), self._latest.latest_step())
            if s is not None
        ]
        return max(steps, default=None)

    def best_step(self) -> Optional[int]:
        return self._best.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `state_like` (an abstract or concrete
        TrainState). Defaults to the highest step across both streams."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        mgr = self._latest if step in self._latest.all_steps() else self._best
        return mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def restore_best(self, state_like: Any) -> Any:
        step = self.best_step()
        if step is None:
            raise FileNotFoundError(
                f"no best-stream checkpoints under {self.directory}"
            )
        return self._best.restore(
            step, args=ocp.args.StandardRestore(state_like)
        )

    def close(self):
        self._best.close()
        self._latest.close()
