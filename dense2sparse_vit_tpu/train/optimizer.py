"""Parameter grouping + AdamW optimizer with per-group schedules.

Parity: reference `get_param_groups` (/root/reference/utils.py:67-90) and the
per-epoch lr assignment of `adjust_learning_rate` (utils.py:93-147), rebuilt
as an optax multi_transform so the whole schedule lives inside the jitted
update (no Python-side requires_grad mutation).

Groups (utils.py:73-90):
  predictor     — any param under a score-predictor / 'dist' module
  early_exit    — early-exit head params
  frozen        — cls_token, pos_embed (reference skips them entirely)
  base_no_decay — 1-D params and biases, weight decay 0
  base_decay    — everything else, weight decay cfg.weight_decay
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax

from dense2sparse_vit_tpu.core.config import TrainConfig
from dense2sparse_vit_tpu.train import schedule as sched


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    ).lower()


def label_params(params) -> Any:
    """Pytree of group labels, mirroring get_param_groups (utils.py:67-90)."""

    def label(path, leaf):
        p = _path_str(path)
        # prm_w: the performer's fixed orthogonal projection
        # (token_performer.py:28-29, requires_grad=False) — without this rule
        # AdamW's weight decay would still shrink it despite zero grads
        if "cls_token" in p or "pos_embed" in p or "prm_w" in p:
            return "frozen"
        if "early_exit" in p:
            return "early_exit"
        if "score_predictor" in p or "dist" in p:
            return "predictor"
        if leaf.ndim <= 1 or p.endswith("bias"):
            return "base_no_decay"
        return "base_decay"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    cfg: TrainConfig,
    steps_per_epoch: int,
    backbone_warmup_freeze: bool = True,
) -> optax.GradientTransformation:
    """AdamW (mask_predictor.py:232) with per-group cosine schedules.

    Schedules are functions of the optax step count; the reference adjusts lr
    once per epoch, so we floor step/steps_per_epoch to the epoch index.

    backbone_warmup_freeze=False keeps the backbone training from epoch 0
    (the DynamicViT gumbel baseline's joint fine-tuning recipe — its loss
    has no warmup gate either, train_step.py::make_dynamic_vit_train_step).
    """

    def epoch_of(count):
        return count // steps_per_epoch

    def pred_sched(count):
        return sched.predictor_lr(epoch_of(count), cfg)

    def backbone_sched(count):
        return sched.backbone_lr(
            epoch_of(count), cfg, warmup_freeze=backbone_warmup_freeze
        )

    def adamw(lr_fn: Callable, wd: float):
        return optax.adamw(
            learning_rate=lr_fn,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=wd,
        )

    tx = optax.multi_transform(
        {
            "predictor": adamw(pred_sched, cfg.weight_decay),
            # reference's early-exit lr is defective dead code (utils.py:133
            # references a variable defined only in comments); intent per the
            # comment block is a predictor-style schedule
            "early_exit": adamw(pred_sched, cfg.weight_decay),
            "base_decay": adamw(backbone_sched, cfg.weight_decay),
            "base_no_decay": adamw(backbone_sched, 0.0),
            "frozen": optax.set_to_zero(),
        },
        label_params,
    )
    if cfg.grad_accum_steps > 1:
        # grads averaged over k micro-steps per update; the inner schedules
        # count UPDATES, so steps_per_epoch should then be updates per epoch
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


def build_optimizer(
    cfg: TrainConfig,
    steps_per_epoch: int,
    backbone_warmup_freeze: bool = True,
) -> optax.GradientTransformation:
    """Driver-facing dispatch: the flattened AdamW (identical updates,
    ~6 fused device ops instead of ~150 per-leaf chains —
    train/flat_optimizer.py, equivalence-tested) unless
    cfg.flat_optimizer=False (e.g. tensor-parallel runs, where per-leaf
    moments must inherit the leaf sharding)."""
    if cfg.flat_optimizer:
        from dense2sparse_vit_tpu.train.flat_optimizer import (
            make_flat_optimizer,
        )

        return make_flat_optimizer(
            cfg, steps_per_epoch,
            backbone_warmup_freeze=backbone_warmup_freeze,
        )
    return make_optimizer(
        cfg, steps_per_epoch, backbone_warmup_freeze=backbone_warmup_freeze
    )
