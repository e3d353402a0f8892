"""Gumbel-softmax keep/drop decisions.

Parity with the DynamicViT-baseline student's training path
(/root/reference/vit_models/default_dynamic_vit.py:449-459):
`F.gumbel_softmax(pred, hard=True)[:, :, 0:1] * prev_decision`, where `pred`
is a 2-class log-softmax over (keep, drop) per token. Hard decisions forward,
soft gradients backward (straight-through estimator).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax(
    key: jax.Array, logits: jnp.ndarray, tau: float = 1.0, hard: bool = True
) -> jnp.ndarray:
    """Sample from the Gumbel-softmax / concrete distribution.

    Matches torch.nn.functional.gumbel_softmax semantics: logits perturbed by
    Gumbel(0,1) noise, divided by temperature, softmaxed over the last axis;
    with `hard`, forward is the one-hot argmax with straight-through gradient.
    """
    gumbels = -jnp.log(-jnp.log(jax.random.uniform(
        key, logits.shape, dtype=jnp.float32, minval=1e-20, maxval=1.0
    ) + 1e-20))
    y_soft = jax.nn.softmax((logits.astype(jnp.float32) + gumbels) / tau, axis=-1)
    if not hard:
        return y_soft.astype(logits.dtype)
    index = jnp.argmax(y_soft, axis=-1)
    y_hard = jax.nn.one_hot(index, logits.shape[-1], dtype=y_soft.dtype)
    # straight-through: forward hard, backward soft
    y = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
    return y.astype(logits.dtype)


def gumbel_softmax_keep(
    key: jax.Array,
    keep_drop_logits: jnp.ndarray,
    prev_decision: jnp.ndarray,
    tau: float = 1.0,
) -> jnp.ndarray:
    """Per-token hard keep decision, ANDed with the previous stage's decision.

    Args:
      keep_drop_logits: (B, N, 2) logits; class 0 = keep, class 1 = drop.
      prev_decision: (B, N, 1) previous cumulative keep decision.

    Returns:
      (B, N, 1) current cumulative keep decision.
    """
    decision = gumbel_softmax(key, keep_drop_logits, tau=tau, hard=True)
    return decision[:, :, 0:1] * prev_decision
