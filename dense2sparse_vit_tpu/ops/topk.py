"""Static-shape token selection primitives.

The reference selects kept tokens by `argsort(score, descending)[:, :K]`
followed by an index sort and a dynamic `torch.gather`
(/root/reference/vit_models/dynamic_vit.py:857-865,912,960). On TPU we keep
the same semantics but make K a compile-time constant so every pruning stage
produces a statically smaller sequence that XLA can tile onto the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def topk_keep_indices(scores: jnp.ndarray, k: int):
    """Top-k token selection with index bookkeeping.

    Args:
      scores: (B, N) per-token keep scores (higher = more important).
      k: static number of tokens to keep.

    Returns:
      (kept, dropped): int32 index arrays of shape (B, k) and (B, N-k), each
      sorted ascending — matching the reference's `torch.sort` of the argsort
      slices (dynamic_vit.py:861-862) so downstream gathers preserve the
      original spatial order of tokens.
    """
    B, N = scores.shape
    # ties: torch.argsort(descending) is not stable, but for float scores from
    # a softmax ties are measure-zero; lax.top_k breaks ties by lowest index.
    _, idx = jax.lax.top_k(scores, N)  # full descending argsort
    kept = jnp.sort(idx[:, :k], axis=-1)
    dropped = jnp.sort(idx[:, k:], axis=-1)
    return kept.astype(jnp.int32), dropped.astype(jnp.int32)


def gather_tokens(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather tokens (B, N, D) by per-batch indices (B, K) -> (B, K, D)."""
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def mask_from_scores(scores: jnp.ndarray, keep_ratio: float) -> jnp.ndarray:
    """Binary keep mask (1=keep) for the top ``int(N*keep_ratio)`` scores.

    Parity with `MaskLoss.get_mask_from_pred_logits` /
    `get_mask_from_cls_attns` (/root/reference/losses.py:121-164): argsort
    descending, ones for the first K slots, scattered back to token order.
    """
    B, N = scores.shape
    k = int(N * keep_ratio)
    # top_k(k) instead of a full N-sort: identical result (top_k orders
    # descending with deterministic index tie-breaks), roughly half the
    # sort work for the common keep ratios
    _, idx = jax.lax.top_k(scores, k)
    mask = jnp.zeros_like(scores)
    return mask.at[jnp.arange(B)[:, None], idx].set(1.0)


def threshold_keep_mask(scores: jnp.ndarray, threshold: float):
    """Data-dependent keep mask from a cumulative score-mass threshold.

    Parity with the reference's threshold path
    (dynamic_vit.py:880-894,935-948): sort scores ascending, take the
    cumulative sum, and keep every token whose prefix sum exceeds the
    threshold (i.e. drop the least-important tail holding <= threshold of
    total mass). Keep counts vary per image, so the result is a mask for
    policy-masked attention — the shape stays static.

    Returns:
      (mask, keep_ratios): (B, N) float mask in {0,1} and (B,) keep fractions.
    """
    B, N = scores.shape
    order = jnp.argsort(scores, axis=-1)  # ascending
    val = jnp.take_along_axis(scores, order, axis=-1)
    th = (jnp.cumsum(val, axis=-1) > threshold).astype(scores.dtype)
    mask = jnp.zeros_like(scores)
    mask = mask.at[jnp.arange(B)[:, None], order].set(th)
    keep_ratios = jnp.sum(th, axis=-1) / N
    return mask, keep_ratios


def compose_kept_indices(stages: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Map stage-local kept indices back to ORIGINAL token coordinates.

    Stage i's kept indices address the token set surviving stage i-1. The
    reference stores the raw per-stage indices and (incorrectly, for >1 stage)
    gathers teacher tokens with the last stage's local indices
    (/root/reference/losses.py:212). We implement the intent: compose the
    chain so the result indexes the original N-token sequence.
    """
    out = stages[0]
    for idx in stages[1:]:
        out = jnp.take_along_axis(out, idx, axis=-1)
    return out


def scatter_token_mask(
    kept_idx: jnp.ndarray, num_tokens: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Binary (B, N) mask with 1 at kept (original-coordinate) indices.

    Replaces the visualization-side scatter reconstruction
    (/root/reference/visualizations.py:18-26).
    """
    B = kept_idx.shape[0]
    mask = jnp.zeros((B, num_tokens), dtype)
    return mask.at[jnp.arange(B)[:, None], kept_idx].set(1.0)
