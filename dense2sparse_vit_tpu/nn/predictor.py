"""Token-importance score predictor ("mask predictor").

Parity: reference PredictorLG (/root/reference/vit_models/dynamic_vit.py:370-560).
Two sizes:
  - small: in = LN -> Dense(d->d) -> GELU;  out = [LN -> Dense -> GELU] x2 -> LN -> Dense(->1)
           (BN variant uses BatchNorm + ReLU instead of LN + GELU)
  - large: in = LN -> Dense(d->4d) -> ReLU; out = 5-layer pyramid 4d->2d->d->d/2->d/4->1
The body splits channels into a local half and a token-mean-pooled global half
(dynamic_vit.py:538-544), concatenates, and scores each token. Scores are
normalized to keep-probabilities with a token-axis softmax for kl/mse mask
losses or a sigmoid for bce (dynamic_vit.py:549-554).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.nn.layers import trunc_normal_init

Dtype = Any


class _NormAct(nn.Module):
    """Norm + Dense + activation unit; LN+GELU/ReLU or BN+ReLU per config."""

    features: int
    use_bn: bool
    act: str  # 'gelu' | 'relu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True):
        if self.use_bn:
            # reference BatchNormLayer (dynamic_vit.py:350-367) normalizes the
            # channel dim across batch AND token axes. Under jit+GSPMD the
            # batch statistics are computed over the global (sharded) batch
            # automatically — XLA inserts the collectives, giving synced BN
            # across devices for free (the reference never ran its BN
            # predictor under DDP at all).
            x = nn.BatchNorm(
                use_running_average=use_running_average,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="norm",
            )(x)
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(
            self.features, dtype=self.dtype,
            kernel_init=trunc_normal_init, name="dense",
        )(x)
        if self.act == "gelu":
            return nn.gelu(x, approximate=False)
        return nn.relu(x)


class PredictorLG(nn.Module):
    """Local-global token scoring head.

    Returns (scores, keep_probs): raw per-token logits (B, N) and normalized
    keep probabilities (B, N).
    """

    embed_dim: int
    small_predictor: bool = False
    use_bn: bool = False
    loss_type: str = "kl_div"  # controls keep-prob normalization
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, *, use_running_average: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = self.embed_dim
        if self.small_predictor:
            # LN variant uses GELU, BN variant uses ReLU (dynamic_vit.py:386-426)
            act = "relu" if self.use_bn else "gelu"
            in_widths: Sequence[int] = (d,)
            out_widths: Sequence[int] = (d // 2, d // 4)
        else:
            act = "relu"  # large predictor uses ReLU in both variants
            in_widths = (4 * d,)
            out_widths = (2 * d, d, d // 2, d // 4)

        for i, w in enumerate(in_widths):
            x = _NormAct(w, self.use_bn, act, self.dtype, name=f"in_{i}")(
                x, use_running_average=use_running_average
            )

        # local/global split: first half channels stay per-token, second half
        # is mean-pooled over tokens and broadcast back (dynamic_vit.py:538-544)
        B, N, C = x.shape
        local_x = x[:, :, : C // 2]
        global_x = jnp.mean(x[:, :, C // 2:], axis=1, keepdims=True)
        x = jnp.concatenate(
            [local_x, jnp.broadcast_to(global_x, (B, N, C // 2))], axis=-1
        )

        for i, w in enumerate(out_widths):
            x = _NormAct(w, self.use_bn, act, self.dtype, name=f"out_{i}")(
                x, use_running_average=use_running_average
            )
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=use_running_average,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="final_norm",
            )(x)
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="final_norm")(x)
        scores = nn.Dense(
            1, dtype=self.dtype, kernel_init=trunc_normal_init, name="final_dense"
        )(x)[..., 0]  # (B, N)

        if self.loss_type in ("kl_div", "mse"):
            keep_probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        else:  # bce
            keep_probs = jax.nn.sigmoid(scores.astype(jnp.float32))
        return scores, keep_probs.astype(scores.dtype)
