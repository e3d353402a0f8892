"""Backbone (classification + distillation) loss.

Parity: reference BackboneLoss (/root/reference/losses.py:167-242):
  cls CE (soft-target CE under mixup) + logit KL(student ‖ teacher)
  + final-token KL with teacher tokens gathered at the kept indices.

Fix over the reference: for multi-stage pruning the reference gathers the
full teacher token set with the LAST stage's stage-local indices
(losses.py:212), which is only correct for a single stage. We gather with the
composed original-coordinate indices (StudentOutput.kept_idx_orig).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def soft_target_cross_entropy(logits: jnp.ndarray, target: jnp.ndarray):
    """timm SoftTargetCrossEntropy: mean over batch of -sum(target * log_softmax)."""
    return jnp.mean(
        jnp.sum(-target * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    )


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray):
    """Standard CE with integer labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def _kl_batchmean(log_p, log_q):
    return jnp.sum(jnp.exp(log_q) * (log_q - log_p)) / log_p.shape[0]


def backbone_loss(
    logits_s: jnp.ndarray,
    tokens_s: jnp.ndarray,
    logits_t: jnp.ndarray,
    tokens_t: Optional[jnp.ndarray],
    labels: jnp.ndarray,
    kept_idx_orig: Optional[jnp.ndarray] = None,
    keep_mask: Optional[jnp.ndarray] = None,
    mixup_active: bool = False,
    tokens_t_probs: Optional[jnp.ndarray] = None,
    tokens_t_entropy: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    """Classification + distillation loss.

    Args:
      logits_s/tokens_s: student head logits (B, C) and final spatial tokens
        (B, K, D) post-norm.
      logits_t/tokens_t: teacher logits (B, C) and full tokens (B, N, D).
      labels: (B,) int labels, or (B, C) soft targets when mixup_active.
      kept_idx_orig: (B, K) kept indices in original coordinates (fixed-ratio
        mode) selecting which teacher tokens align with tokens_s.
      keep_mask: (B, N) keep mask (threshold mode) — token KL averaged over
        kept tokens only (reference's ragged boolean select, losses.py:216,
        done as masked mean).
      mixup_active: labels are soft targets (reference losses.py:170-175).
      tokens_t_probs/tokens_t_entropy: frozen-teacher-cache fast path —
        q = softmax(tokens_t) (B, N, D) and the per-row entropy term
        sum(q*log q) (B, N), precomputed once at cache build. The KL row is
        then entropy - sum(q * log_softmax(tokens_s)): SAME value as the
        tokens_t path (sum q·log q − sum q·ls), without recomputing the
        teacher-side log_softmax + exp every step. tokens_t may be None.

    Returns:
      (loss, metrics dict).
    """
    logits_s = logits_s.astype(jnp.float32)
    logits_t = logits_t.astype(jnp.float32)
    if mixup_active:
        cls_loss = soft_target_cross_entropy(logits_s, labels)
    else:
        cls_loss = cross_entropy(logits_s, labels)

    cls_kl = _kl_batchmean(
        jax.nn.log_softmax(logits_s, axis=-1),
        jax.nn.log_softmax(logits_t, axis=-1),
    )

    ls = jax.nn.log_softmax(tokens_s.astype(jnp.float32), axis=-1)
    if tokens_t_probs is not None:
        q_full = tokens_t_probs.astype(jnp.float32)
        h_full = tokens_t_entropy.astype(jnp.float32)
        if kept_idx_orig is not None:
            q = jnp.take_along_axis(q_full, kept_idx_orig[..., None], axis=1)
            h = jnp.take_along_axis(h_full, kept_idx_orig, axis=1)
            per_token = h - jnp.sum(q * ls, axis=-1)  # (B, K)
            token_kl = jnp.mean(per_token)
        elif keep_mask is not None:
            per_token = h_full - jnp.sum(q_full * ls, axis=-1)
            token_kl = jnp.sum(per_token * keep_mask) / jnp.maximum(
                jnp.sum(keep_mask), 1.0
            )
        else:
            per_token = h_full - jnp.sum(q_full * ls, axis=-1)
            token_kl = jnp.mean(per_token)
    elif kept_idx_orig is not None:
        lt_full = jax.nn.log_softmax(tokens_t.astype(jnp.float32), axis=-1)
        lt = jnp.take_along_axis(
            lt_full, kept_idx_orig[..., None], axis=1
        )
        # reference flattens (B*K, C) and uses batchmean => divide by B*K
        per_token = jnp.sum(jnp.exp(lt) * (lt - ls), axis=-1)  # (B, K)
        token_kl = jnp.mean(per_token)
    elif keep_mask is not None:
        lt_full = jax.nn.log_softmax(tokens_t.astype(jnp.float32), axis=-1)
        per_token = jnp.sum(jnp.exp(lt_full) * (lt_full - ls), axis=-1)
        token_kl = jnp.sum(per_token * keep_mask) / jnp.maximum(
            jnp.sum(keep_mask), 1.0
        )
    else:
        lt_full = jax.nn.log_softmax(tokens_t.astype(jnp.float32), axis=-1)
        per_token = jnp.sum(jnp.exp(lt_full) * (lt_full - ls), axis=-1)
        token_kl = jnp.mean(per_token)

    loss = cls_loss + cls_kl + token_kl
    metrics = {
        "backbone_loss": loss,
        "cls_loss": cls_loss,
        "cls_kl_loss": cls_kl,
        "token_kl_loss": token_kl,
    }
    return loss, metrics
