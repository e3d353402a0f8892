"""Policy-masked attention softmax.

Semantics match the reference's `Attention.softmax_with_policy`
(/root/reference/vit_models/dynamic_vit.py:195-214): attention columns of
dropped tokens are zeroed except on the diagonal (a dropped token may still
attend to itself, keeping its row a valid distribution), with eps/N additive
smoothing for numerical stability, computed in float32.

This is the static-shape alternative to gathering kept tokens: sequence length
never changes, XLA sees fixed shapes, and the pruning decision is data.
"""

from __future__ import annotations

import jax.numpy as jnp


def softmax_with_policy(
    attn: jnp.ndarray, policy: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """Row-wise softmax of attention logits with per-token keep policy.

    Args:
      attn: (B, H, N, N) raw attention logits (already scaled).
      policy: (B, N) or (B, N, 1) keep mask in {0, 1} (float); 1 = kept.
      eps: smoothing constant (reference default 1e-6).

    Returns:
      (B, H, N, N) attention probabilities, dtype of `attn`.
    """
    in_dtype = attn.dtype
    B, H, N, _ = attn.shape
    policy = policy.reshape(B, N)
    # each row masks dropped columns, except a dropped token keeps itself
    attn_policy = policy[:, None, None, :]  # (B, 1, 1, N)
    eye = jnp.eye(N, dtype=attn_policy.dtype)[None, None]
    attn_policy = attn_policy + (1.0 - attn_policy) * eye

    # softmax is shift-invariant; subtract the row max pre-exp for stability
    max_att = jnp.max(attn, axis=-1, keepdims=True)
    attn = (attn - max_att).astype(jnp.float32)
    attn = jnp.exp(attn) * attn_policy.astype(jnp.float32)
    attn = (attn + eps / N) / (jnp.sum(attn, axis=-1, keepdims=True) + eps)
    return attn.astype(in_dtype)
