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
