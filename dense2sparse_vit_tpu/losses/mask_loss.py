"""Mask-predictor supervision losses.

Parity: reference MaskLoss (/root/reference/losses.py:6-164). The predictor's
per-token scores are supervised by the frozen teacher's CLS attention:
aggregated over layers/heads, renormalized over spatial tokens, re-gathered and
renormalized at each pruning stage by the previous stage's kept indices.

Functional design: the reference is an nn.Module mutating a shared running-
metrics dict (losses.py:111-117); here losses are pure functions returning
(loss, metrics) so they jit/grad cleanly and metrics reduce with psum.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.ops.topk import mask_from_scores


def aggregate_teacher_cls_attn(
    cls_attns: jnp.ndarray, mean_heads: bool = False
) -> jnp.ndarray:
    """(B, L, H, N+1) teacher CLS-attention stack -> (B, N) target.

    Mean over layers, max (default) or mean over heads, drop the CLS column,
    renormalize over spatial tokens (reference losses.py:76-79).
    """
    t = jnp.mean(cls_attns.astype(jnp.float32), axis=1)  # (B, H, N+1)
    t = jnp.mean(t, axis=1) if mean_heads else jnp.max(t, axis=1)
    t = t[:, 1:]
    return t / jnp.sum(t, axis=-1, keepdims=True)


def _kl_batchmean_log_target(log_p: jnp.ndarray, log_q: jnp.ndarray) -> jnp.ndarray:
    """torch.F.kl_div(log_p, log_q, log_target=True, reduction='batchmean'):
    sum(exp(log_q) * (log_q - log_p)) / batch."""
    B = log_p.shape[0]
    return jnp.sum(jnp.exp(log_q) * (log_q - log_p)) / B


def mask_loss(
    pred_logits: Sequence[jnp.ndarray],
    teacher_cls_attns: jnp.ndarray,
    kept_idx: Sequence[jnp.ndarray],
    keep_ratios: Sequence[float],
    loss_type: str = "kl_div",
    mean_heads: bool = False,
    keep_masks: Sequence[jnp.ndarray] = (),
    teacher_target: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, dict]:
    """Mask-prediction loss over all pruning stages.

    Args:
      pred_logits: per-stage raw predictor scores, stage i has shape
        (B, N_i) where N_i is the pre-stage token count.
      teacher_cls_attns: (B, L, H, N+1) teacher CLS attention stack.
      kept_idx: per-stage kept indices in STAGE-LOCAL coordinates
        (StudentOutput.kept_idx).
      keep_ratios: static per-stage keep ratios (config).
      loss_type: 'kl_div' | 'mse' | 'bce'.
      keep_masks: threshold mode — per-stage (B, N) spatial keep masks;
        tokens never move, so stage i's teacher target is restricted to
        stage i-1's survivors by MASKING + renormalizing instead of the
        gather (the reference's threshold-mode loss chaining is dead code —
        it appends flattened boolean masks where losses.py:83-90 expects
        indices; this implements the intent).
      teacher_target: precomputed (B, N) aggregate_teacher_cls_attn output
        (frozen-teacher cache path); when given, teacher_cls_attns is unused
        and may be None.

    Returns:
      (loss, metrics) where metrics has per-stage mask accuracies.
    """
    if teacher_target is not None:
        renorm = teacher_target.astype(jnp.float32)
        renorm = renorm / jnp.sum(renorm, axis=-1, keepdims=True)
    else:
        renorm = aggregate_teacher_cls_attn(teacher_cls_attns, mean_heads)
    loss = jnp.float32(0.0)
    metrics = {}
    for i, logits in enumerate(pred_logits):
        logits = logits.astype(jnp.float32)
        if i > 0:
            # chain: restrict the teacher target to the tokens that survived
            # stage i-1, renormalize (losses.py:83-90)
            if kept_idx:
                renorm = jnp.take_along_axis(renorm, kept_idx[i - 1], axis=-1)
            else:
                renorm = renorm * keep_masks[i - 1].astype(renorm.dtype)
            # guard 0/0: a threshold >= the total score mass can zero a
            # sample's entire keep mask; the floored denominator turns that
            # sample's target into zeros (KL contribution 0) instead of NaN
            renorm = renorm / jnp.maximum(
                jnp.sum(renorm, axis=-1, keepdims=True), 1e-30
            )
            stage_ratio = keep_ratios[i] / keep_ratios[i - 1]
        else:
            stage_ratio = keep_ratios[i]

        if loss_type == "kl_div":
            # masked-out targets are exactly 0: their KL contribution is 0,
            # but 0 * log(0) would be NaN — floor the log argument (the
            # floored contribution is ~1e-28, numerically zero)
            safe_log = jnp.log(jnp.maximum(renorm, 1e-30))
            loss = loss + _kl_batchmean_log_target(
                jax.nn.log_softmax(logits, axis=-1), safe_log
            )
        elif loss_type == "mse":
            # reference compares RAW scores to the renormalized attention,
            # scaled x100 (losses.py:74)
            loss = loss + 100.0 * jnp.mean((logits - renorm) ** 2)
        elif loss_type == "bce":
            # reference intent (its bce path is dead code, losses.py:57-58):
            # class-imbalance-weighted BCE-with-logits against the teacher
            # top-k ground-truth mask; positive (kept) class weighted by
            # (1-r)/r to counter imbalance (losses.py:26-29)
            gt = mask_from_scores(renorm, stage_ratio)
            pos_w = (1.0 - stage_ratio) / stage_ratio
            log_sig = jax.nn.log_sigmoid(logits)
            log_one_minus = jax.nn.log_sigmoid(-logits)
            bce = -(pos_w * gt * log_sig + (1.0 - gt) * log_one_minus)
            loss = loss + jnp.mean(bce)
        else:
            raise ValueError(f"unknown mask loss type {loss_type!r}")

        # mask accuracy: predicted top-k mask vs teacher top-k mask
        # (losses.py:60,96). The reference ranks softmax/sigmoid outputs;
        # both are strictly monotonic, so ranking the raw logits yields the
        # identical mask without the elementwise transform
        pred_mask = mask_from_scores(logits, stage_ratio)
        gt_mask = mask_from_scores(renorm, stage_ratio)
        metrics[f"mask_acc_{i}"] = jnp.mean(pred_mask == gt_mask)

    metrics["mask_loss"] = loss
    return loss, metrics
