"""Learning-rate / sigma / curriculum schedules.

Parity: reference `adjust_learning_rate` (/root/reference/utils.py:93-147),
`get_current_keep_ratio` (:150-163), `get_current_patch_score_threshold`
(:165-179). Schedules are pure functions of the epoch (the reference steps
them once per epoch), usable both as host-side floats and inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from dense2sparse_vit_tpu.core.config import TrainConfig


def cosine_lr(epoch, cfg: TrainConfig):
    """Cosine from cfg.lr to cfg.min_lr over cfg.epochs (utils.py:96-97)."""
    cos = (jnp.cos(epoch / cfg.epochs * jnp.pi) + 1.0) * 0.5
    return cfg.min_lr + cos * (cfg.lr - cfg.min_lr)


def predictor_lr(epoch, cfg: TrainConfig):
    """The predictor always trains at the cosine lr (utils.py:118,126)."""
    return cosine_lr(epoch, cfg)


def backbone_lr(epoch, cfg: TrainConfig, warmup_freeze: bool = True):
    """Backbone: frozen during warmup (and under --freeze-backbone), then
    capped at min(lr * 0.01, cos_lr) (utils.py:112-127).

    warmup_freeze=False drops the warmup zeroing (keeping the lr cap):
    the DynamicViT gumbel baseline fine-tunes the whole model from epoch 0
    — its recipe has no predictor-only phase."""
    if cfg.freeze_backbone:
        return jnp.zeros_like(cosine_lr(epoch, cfg))
    lr = jnp.minimum(cfg.lr * cfg.backbone_lr_scale, cosine_lr(epoch, cfg))
    if not warmup_freeze:
        return lr
    return jnp.where(epoch < cfg.warmup_epochs, 0.0, lr)


def sigma_schedule(epoch, epochs: int, initial_sigma: float = 0.05):
    """Perturbed top-k noise decays linearly to 0 (utils.py:95)."""
    return jnp.maximum(0.0, (1.0 - epoch / epochs) * initial_sigma)


def current_keep_ratio(epoch, min_ratio: float = 0.3, ramp_epochs: int = 90):
    """Keep-ratio curriculum: linear 1.0 -> min_ratio over ramp_epochs
    (utils.py:150-163)."""
    ratio = 1.0 - (1.0 - min_ratio) / ramp_epochs * epoch
    return jnp.maximum(ratio, min_ratio)


def current_patch_score_threshold(
    epoch, base: float = 0.1, maximum: float = 0.5, ramp_epochs: int = 90
):
    """Threshold curriculum: linear base -> maximum over ramp_epochs
    (utils.py:165-179)."""
    th = (maximum - base) / ramp_epochs * epoch + base
    return jnp.minimum(th, maximum)
