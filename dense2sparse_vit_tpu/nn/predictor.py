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


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch.nn.BatchNorm1d running-stat semantics.

    flax.linen.BatchNorm updates the running variance with the BIASED batch
    variance; torch updates it with the UNBIASED one (Bessel-corrected by
    n/(n-1) over the n reduced elements) while still normalizing the batch
    with the biased variance. The reference's BatchNormLayer
    (/root/reference/vit_models/dynamic_vit.py:350-367) is a plain
    BatchNorm1d, so matching its trained running stats exactly requires the
    unbiased update. `momentum` follows the torch convention:
    new = (1 - momentum) * old + momentum * batch (torch default 0.1, i.e.
    the same decay as flax momentum=0.9).

    Param/stat names match flax.linen.BatchNorm ("scale"/"bias" in params,
    "mean"/"var" in batch_stats) so checkpoint converters and GSPMD
    sharding rules are unaffected. Statistics are computed in float32; under
    jit+GSPMD the batch reductions run over the global (sharded) batch —
    XLA inserts the cross-device collectives (synced BN for free).
    """

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, use_running_average: bool):
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            n = x.size // x.shape[-1]
            mean = jnp.mean(xf, axis=reduce_axes)
            # biased variance normalizes the batch (torch semantics)
            var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype)


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
            # channel dim across batch AND token axes; TorchBatchNorm pins
            # the running-stat update (unbiased variance) to torch exactly.
            x = TorchBatchNorm(
                features=x.shape[-1],
                dtype=self.dtype,
                name="norm",
            )(x, use_running_average=use_running_average)
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
            x = TorchBatchNorm(
                features=x.shape[-1],
                dtype=self.dtype,
                name="final_norm",
            )(x, use_running_average=use_running_average)
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
            x = TorchBatchNorm(
                features=x.shape[-1], dtype=self.dtype, name=f"out_bn_{i}",
            )(x, use_running_average=use_running_average)
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
