"""Distillation / ratio losses for the DynamicViT-baseline student and the
direct mask-logit optimization experiment.

Parity:
  - kd_loss (/root/reference/optimized_mask.py:24-41): temperature-scaled
    KL(student ‖ teacher) + CE + keep-ratio penalty
    (max(0.35, 1 - epoch/40) - mean_keep)^2.
  - keep-ratio loss of the DynamicViT paper training recipe (--use-ratio-loss,
    utils.py:232-235): MSE between the mean predicted keep ratio and the
    target ratio at each pruning stage.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def keep_ratio_loss(
    pred_keep_probs: Sequence[jnp.ndarray],
    target_ratios: Sequence[float],
) -> jnp.ndarray:
    """Mean squared deviation of per-stage mean keep probability from target.

    pred_keep_probs: per-stage (B, N_i) keep probabilities (or (B, N_i, 1)
    cumulative hard decisions in the gumbel path).
    """
    loss = jnp.float32(0.0)
    for probs, r in zip(pred_keep_probs, target_ratios):
        probs = probs.reshape(probs.shape[0], -1).astype(jnp.float32)
        mean_keep = jnp.mean(probs, axis=-1)
        loss = loss + jnp.mean((mean_keep - r) ** 2)
    return loss / max(len(pred_keep_probs), 1)


def dynamic_vit_distill_loss(
    logits_s: jnp.ndarray,
    tokens_s: jnp.ndarray,
    logits_t: jnp.ndarray,
    tokens_t: jnp.ndarray,
    labels: jnp.ndarray,
    pred_keep_probs: Sequence[jnp.ndarray],
    decisions: jnp.ndarray,
    target_ratios: Sequence[float],
    cls_weight: float = 1.0,
    ratio_weight: float = 2.0,
    dist_weight: float = 0.5,
    use_ratio_loss: bool = True,
    use_token_dist_loss: bool = True,
    mixup_active: bool = False,
    temperature: float = 1.0,
) -> Tuple[jnp.ndarray, dict]:
    """DynamicViT training loss for the gumbel-policy student.

    The reference wires this through the (dead) `DistillDiffPruningLoss`
    symbol (ddp_training.py:81 — never defined in losses.py); the loss
    surface is defined by the flags --cls-weight / --use-ratio-loss /
    --ratio-weight / --use-token-dist-loss / --dist-weight / --softmax-temp
    (utils.py:228-244), matching the DynamicViT paper recipe:
      cls_weight * CE + KL_T(student || teacher logits)
      + ratio_weight * mean_stage (mean_keep - r)^2
      + dist_weight * token MSE over KEPT tokens.
    temperature is the --softmax-temp "temperature value used for the
    softmax functions in the distillation loss parts" (utils.py:230-231):
    both logit distributions are softened by 1/T and the KL is rescaled by
    T^2 so gradient magnitude stays comparable across temperatures.
    """
    from dense2sparse_vit_tpu.losses.backbone_loss import (
        cross_entropy,
        soft_target_cross_entropy,
    )

    logits_s = logits_s.astype(jnp.float32)
    logits_t = logits_t.astype(jnp.float32)
    if mixup_active:
        cls = soft_target_cross_entropy(logits_s, labels)
    else:
        cls = cross_entropy(logits_s, labels)

    T = float(temperature)
    log_p = jax.nn.log_softmax(logits_s / T, axis=-1)
    log_q = jax.nn.log_softmax(logits_t / T, axis=-1)
    cls_kl = (
        jnp.sum(jnp.exp(log_q) * (log_q - log_p)) / log_p.shape[0] * (T * T)
    )

    loss = cls_weight * cls + cls_kl
    metrics = {"dyn_cls_loss": cls, "dyn_cls_kl": cls_kl}

    if use_ratio_loss:
        ratio = keep_ratio_loss(pred_keep_probs, target_ratios)
        loss = loss + ratio_weight * ratio
        metrics["dyn_ratio_loss"] = ratio
    if use_token_dist_loss:
        # masked token MSE: only tokens still alive contribute
        d = decisions.astype(jnp.float32)  # (B, N, 1)
        diff = (tokens_s.astype(jnp.float32) - tokens_t.astype(jnp.float32)) ** 2
        tok = jnp.sum(diff.mean(-1, keepdims=True) * d) / jnp.maximum(
            jnp.sum(d), 1.0
        )
        loss = loss + dist_weight * tok
        metrics["dyn_token_dist_loss"] = tok
    metrics["dyn_loss"] = loss
    return loss, metrics


def predictor_bce_vs_teacher(
    pred_keep_probs: Sequence[jnp.ndarray],
    teacher_target: jnp.ndarray,
    keep_ratios: Sequence[float],
) -> jnp.ndarray:
    """BCE between predictor keep probabilities and the teacher's CLS-attn
    ground-truth mask (--teacher-cls-loss).

    The reference parses the flag ("binary cross entropy loss between
    averaged teacher CLS attention weights as labels and logits from the
    predictor network", utils.py:241-243) for its dead
    DistillDiffPruningLoss path; this implements the stated intent for the
    gumbel student, whose tokens never move in training: per stage, the
    label is the top-int(N*r) mask of the renormalized teacher CLS
    attention over the ORIGINAL token grid (ratio convention of
    dynamic_vit.py:828,852), with the kept class weighted by (1-r)/r
    against class imbalance (losses.py:26-29).

    pred_keep_probs: per-stage (B, N) keep probabilities in (0, 1).
    teacher_target: (B, N) renormalized teacher CLS attention
      (aggregate_teacher_cls_attn output / the cache's 'target' rows).
    """
    from dense2sparse_vit_tpu.ops.topk import mask_from_scores

    t = teacher_target.astype(jnp.float32)
    t = t / jnp.maximum(jnp.sum(t, axis=-1, keepdims=True), 1e-30)
    loss = jnp.float32(0.0)
    for probs, r in zip(pred_keep_probs, keep_ratios):
        gt = mask_from_scores(t, r).astype(jnp.float32)
        p = jnp.clip(probs.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
        w_pos = (1.0 - r) / r
        bce = -(w_pos * gt * jnp.log(p) + (1.0 - gt) * jnp.log(1.0 - p))
        loss = loss + jnp.mean(bce)
    return loss / max(len(pred_keep_probs), 1)


def kd_loss(
    logits_s: jnp.ndarray,
    logits_t: jnp.ndarray,
    labels: jnp.ndarray,
    keep_decisions: jnp.ndarray,
    epoch: jnp.ndarray | float,
    temperature: float = 1.0,
    ratio_epochs: float = 40.0,
    min_ratio: float = 0.35,
) -> Tuple[jnp.ndarray, dict]:
    """Knowledge-distillation loss with a scheduled keep-ratio penalty.

    Args:
      keep_decisions: (B, N) or (B, N, 1) keep decisions in [0, 1].
      epoch: current epoch (drives the linear ratio schedule).
    """
    logits_s = logits_s.astype(jnp.float32)
    logits_t = logits_t.astype(jnp.float32)
    T = temperature
    log_p = jax.nn.log_softmax(logits_s / T, axis=-1)
    log_q = jax.nn.log_softmax(logits_t / T, axis=-1)
    kl = jnp.sum(jnp.exp(log_q) * (log_q - log_p)) / log_p.shape[0] * (T * T)

    logp = jax.nn.log_softmax(logits_s, axis=-1)
    ce = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

    target_ratio = jnp.maximum(min_ratio, 1.0 - epoch / ratio_epochs)
    mean_keep = jnp.mean(
        keep_decisions.reshape(keep_decisions.shape[0], -1).astype(jnp.float32)
    )
    ratio_pen = (target_ratio - mean_keep) ** 2

    loss = kl + ce + ratio_pen
    return loss, {
        "kd_kl": kl,
        "kd_ce": ce,
        "kd_ratio_penalty": ratio_pen,
        "kd_mean_keep": mean_keep,
    }
