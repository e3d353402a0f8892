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
            # torch nn.LayerNorm default eps (the predictor omits the
            # backbone's eps=1e-6 override, dynamic_vit.py:410-424)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             use_fast_variance=False, name="norm")(x)
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
    # run the whole LN->Dense->act pyramid as ONE Pallas kernel on the
    # deterministic path (ops/pallas/predictor.py); training and the BN
    # variant keep the flax path (autodiff / cross-batch statistics)
    use_fused: bool = False

    @nn.compact
    def __call__(
        self, x, *, use_running_average: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = self.embed_dim
        if (
            self.use_fused
            and not self.use_bn
            and use_running_average
            and not self.is_initializing()
        ):
            from dense2sparse_vit_tpu.ops.pallas.predictor import (
                fused_predictor_lg,
            )

            act = "gelu" if self.small_predictor else "relu"
            scores = fused_predictor_lg(
                x, self.variables["params"], act=act
            )
            if self.loss_type in ("kl_div", "mse"):
                keep_probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            else:  # bce
                keep_probs = jax.nn.sigmoid(scores.astype(jnp.float32))
            return scores, keep_probs.astype(scores.dtype)
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
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             use_fast_variance=False, name="final_norm")(x)
        scores = nn.Dense(
            1, dtype=self.dtype, kernel_init=trunc_normal_init, name="final_dense"
        )(x)[..., 0]  # (B, N)

        if self.loss_type in ("kl_div", "mse"):
            keep_probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        else:  # bce
            keep_probs = jax.nn.sigmoid(scores.astype(jnp.float32))
        return scores, keep_probs.astype(scores.dtype)


class PredictorAggregator(nn.Module):
    """Dropped-token summarizer (experimental in the reference: defined at
    dynamic_vit.py:562-598, its wiring commented out at :724-734).

    Compresses a (B, N_dropped, D) set of dropped tokens into (B, 1, D) via
    a local/global split and a token-axis BN MLP pyramid over the SEQUENCE
    dimension.
    """

    sequence_length: int
    embed_dim: int = 384
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True):
        B, N, C = x.shape
        x = _NormAct(self.embed_dim, True, "relu", self.dtype, name="in_0")(
            x, use_running_average=use_running_average
        )
        local_x = x[:, :, : C // 2]
        global_x = jnp.mean(x[:, :, C // 2:], axis=1, keepdims=True)
        x = jnp.concatenate(
            [local_x, jnp.broadcast_to(global_x, (B, N, C - C // 2))], axis=-1
        )
        # pyramid over the token axis: transpose to (B, C, N)
        x = x.transpose(0, 2, 1)
        widths = (self.sequence_length // 2, self.sequence_length // 4, 1)
        for i, w in enumerate(widths):
            x = nn.BatchNorm(
                use_running_average=use_running_average, momentum=0.9,
                epsilon=1e-5, dtype=self.dtype, name=f"out_bn_{i}",
            )(x)
            x = nn.Dense(w, dtype=self.dtype, kernel_init=trunc_normal_init,
                         name=f"out_dense_{i}")(x)
            if i < len(widths) - 1:
                x = nn.relu(x)
        return x.transpose(0, 2, 1)  # (B, 1, C)


class PredictorReconstructor(nn.Module):
    """Dropped-token reconstructor (experimental in the reference: defined at
    dynamic_vit.py:600-639, unused). Residual LN-MLP encoder + LN-MLP decoder."""

    embed_dim: int = 384
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.embed_dim

        def mlp_stack(h, name):
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"{name}_norm0")(h)
            h = nn.Dense(2 * d, dtype=self.dtype,
                         kernel_init=trunc_normal_init, name=f"{name}_fc0")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"{name}_norm1")(h)
            h = nn.Dense(2 * d, dtype=self.dtype,
                         kernel_init=trunc_normal_init, name=f"{name}_fc1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"{name}_norm2")(h)
            return nn.Dense(d, dtype=self.dtype,
                            kernel_init=trunc_normal_init, name=f"{name}_fc2")(h)

        y = x + mlp_stack(x, "in")
        return mlp_stack(y, "out")
