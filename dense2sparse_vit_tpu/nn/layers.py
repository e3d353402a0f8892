"""Core ViT layers (flax.linen), TPU-first.

Functional re-implementations of the reference's in-repo layer definitions
(/root/reference/vit_models/dynamic_vit.py:159-306). Differences by design:

- images are NHWC (TPU conv layout), not NCHW
- attention accepts an optional (B, N) keep `policy`; when given, the softmax
  uses the masked semantics of `ops.softmax_with_policy` — this is the
  static-shape pruning path
- computation dtype is configurable (bfloat16 on TPU); softmax and layer norms
  accumulate in float32
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.ops.masked_softmax import softmax_with_policy

Dtype = Any

# DeiT/timm init: trunc_normal(std=.02) for linear kernels, zeros for biases
# (reference dynamic_vit.py:794-801)
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)

# one-time notice that elementwise dropout forced the unfused path
_unfused_dropout_warned = [False]


def _warn_unfused_dropout(drop: float, attn_drop: float) -> None:
    """Elementwise dropout (drop/attn_drop > 0) has no fused-kernel
    implementation, so a use_fused Block silently trains ~1.4x slower on the
    flax path. No reference or timm ViT recipe sets these rates (drop_path
    IS fused), so this is a config smell worth one loud warning."""
    if _unfused_dropout_warned[0]:
        return
    _unfused_dropout_warned[0] = True
    import warnings

    warnings.warn(
        f"use_fused requested but elementwise dropout is active "
        f"(drop={drop}, attn_drop={attn_drop}): training falls back to the "
        f"unfused flax path (~1.4x slower per step). drop_path is fused; "
        f"set drop/attn_drop to 0 to keep the fused-kernel training path.",
        stacklevel=3,
    )


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> act -> drop -> fc2 -> drop.

    Parity: reference Mlp (dynamic_vit.py:159-175).
    """

    hidden_features: int
    out_features: Optional[int] = None
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]
        x = nn.Dense(
            self.hidden_features, dtype=self.dtype,
            kernel_init=trunc_normal_init, name="fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(
            out_features, dtype=self.dtype,
            kernel_init=trunc_normal_init, name="fc2",
        )(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with optional keep-policy masking.

    Parity: reference Attention (dynamic_vit.py:179-236), including
    `softmax_with_policy` and the `return_cls_attn` hook that exposes the CLS
    row of the attention matrix, (B, H, N).
    """

    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32
    use_fused: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        policy: Optional[jnp.ndarray] = None,
        *,
        return_cls_attn: bool = False,
        deterministic: bool = True,
    ):
        B, N, C = x.shape
        head_dim = C // self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        qkv = nn.Dense(
            C * 3, use_bias=self.qkv_bias, dtype=self.dtype,
            kernel_init=trunc_normal_init, name="qkv",
        )(x)

        if self.use_fused and (self.attn_drop == 0.0 or deterministic):
            # fused Pallas kernel on the packed qkv layout — no transposes,
            # scores never leave VMEM (ops/pallas/attention.py). Policy mode
            # keeps the CLS column by construction: callers pass the full
            # (B, N) mask including the CLS slot. The trainable wrappers are
            # custom-VJPs (Pallas forward, reference backward), so this path
            # is safe under jax.grad. CLS-attention capture is a second
            # kernel output (no extra matmuls).
            from dense2sparse_vit_tpu.ops.pallas.attention import (
                fused_attention_packed_trainable,
                fused_attention_packed_with_cls_trainable,
            )

            pol = policy.reshape(B, N) if policy is not None else None
            cls_attn = None
            if return_cls_attn:
                out, cls_attn = fused_attention_packed_with_cls_trainable(
                    qkv, self.num_heads, pol, scale
                )
            else:
                out = fused_attention_packed_trainable(
                    qkv, self.num_heads, pol, scale
                )
            out = nn.Dense(
                C, dtype=self.dtype, kernel_init=trunc_normal_init, name="proj"
            )(out)
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
            if return_cls_attn:
                return out, cls_attn
            return out

        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * scale
        if policy is None:
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        else:
            attn = softmax_with_policy(attn, policy)
        attn = attn.astype(self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(
            C, dtype=self.dtype, kernel_init=trunc_normal_init, name="proj"
        )(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if return_cls_attn:
            return out, attn[:, :, 0, :]
        return out


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Block(nn.Module):
    """Pre-norm transformer encoder block.

    Parity: reference Block (dynamic_vit.py:240-283) — norm1 -> attn ->
    residual(+droppath) -> norm2 -> mlp -> residual, with policy/cls-attn
    passthrough.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    layer_norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    use_fused: bool = False
    # "int8": post-training-quantized projections on the deterministic
    # dense serving path (ops/pallas/quant.py). Training / policy-mask /
    # CLS-capture calls fall through to the bf16 paths unchanged.
    quant: str = "none"

    @nn.compact
    def __call__(
        self,
        x,
        policy: Optional[jnp.ndarray] = None,
        *,
        return_cls_attn: bool = False,
        deterministic: bool = True,
    ):
        C = x.shape[-1]
        cls_attn = None
        dp = DropPath(self.drop_path, name="drop_path")
        # fused half-block gates: always on the deterministic path; ALSO in
        # training when dropout/droppath are inactive (the reference's
        # default pruning-finetune config) — both halves have fused
        # backward kernels for plain AND policy modes (the policy block
        # backward emits dPolicy, the gumbel/threshold gradient channel).
        # Only CLS capture under grad keeps the flax + packed-kernel path.
        drops_off = (
            self.drop == 0.0 and self.attn_drop == 0.0
            and self.drop_path == 0.0
        )
        # drop_path ALONE (the regularizer every from-scratch T2T/TNT
        # recipe uses; elementwise dropout rates stay 0 there) keeps the
        # fused path: DropPath is a per-sample branch multiplier, passed
        # to the whole-block kernel as a (B,) operand in both directions.
        dp_only = (
            self.drop == 0.0 and self.attn_drop == 0.0
            and self.drop_path > 0.0
        )
        attn_fusable = (
            self.use_fused
            and not self.is_initializing()
            and (
                deterministic
                or ((drops_off or dp_only) and not return_cls_attn)
            )
        )
        if (
            self.use_fused
            and not self.is_initializing()
            and not deterministic
            and (self.drop > 0.0 or self.attn_drop > 0.0)
        ):
            _warn_unfused_dropout(self.drop, self.attn_drop)
        if attn_fusable:
            # the WHOLE block as one Pallas kernel (ops/pallas/block.py):
            # LN1 folded into qkv, attention core, proj, residual, then the
            # MLP half on the VMEM-resident intermediate — per block, HBM
            # sees one read of x and one write of the output in EACH
            # direction (the custom VJP runs the single-kernel whole-block
            # backward; x_mid never round-trips HBM).
            # Elementwise dropout is inactive on every path that reaches
            # here; drop_path (if active) enters the kernel as per-sample
            # branch scales, so semantics match the flax path exactly.
            from dense2sparse_vit_tpu.ops.pallas.block import (
                fused_transformer_block,
                fused_transformer_block_trainable,
            )

            p = self.variables["params"]
            ap = p["attn"]
            head_dim = C // self.num_heads
            bqkv = (
                ap["qkv"]["bias"] if self.qkv_bias
                else jnp.zeros((3 * C,), self.dtype)
            )
            pol = (
                policy.reshape(x.shape[0], x.shape[1])
                if policy is not None else None
            )
            pd = {
                "ln1_scale": p["norm1"]["scale"],
                "ln1_bias": p["norm1"]["bias"],
                "wqkv": ap["qkv"]["kernel"].astype(self.dtype),
                "bqkv": bqkv,
                "wproj": ap["proj"]["kernel"].astype(self.dtype),
                "bproj": ap["proj"]["bias"],
                "ln2_scale": p["norm2"]["scale"],
                "ln2_bias": p["norm2"]["bias"],
                "w1": p["mlp"]["fc1"]["kernel"].astype(self.dtype),
                "b1": p["mlp"]["fc1"]["bias"],
                "w2": p["mlp"]["fc2"]["kernel"].astype(self.dtype),
                "b2": p["mlp"]["fc2"]["bias"],
            }
            sc = self.qk_scale or head_dim ** -0.5
            if (
                self.quant == "int8"
                and deterministic
                and policy is None
                and not return_cls_attn
            ):
                # quantized serving path: int8 MXU projections
                # (ops/pallas/quant.py); under AOT export the per-call
                # weight quantization constant-folds away
                from dense2sparse_vit_tpu.ops.pallas.quant import (
                    fused_transformer_block_int8,
                )

                return fused_transformer_block_int8(
                    x, pd, self.num_heads, scale=sc,
                    ln_eps=self.layer_norm_eps,
                )
            branch_scales = None
            if dp_only and not deterministic:
                # stochastic depth: Bernoulli(keep)/keep per sample per
                # branch (reference drop_path, dynamic_vit.py:265-266);
                # two draws ≙ the flax path's two DropPath applications
                keep = 1.0 - self.drop_path
                r1, r2 = jax.random.split(self.make_rng("dropout"))
                B = x.shape[0]
                branch_scales = (
                    jax.random.bernoulli(r1, keep, (B,)).astype(
                        jnp.float32
                    ) / keep,
                    jax.random.bernoulli(r2, keep, (B,)).astype(
                        jnp.float32
                    ) / keep,
                )
            if return_cls_attn:
                # CLS-row capture is a second kernel output (no extra
                # matmuls); only reached without gradients (teacher
                # capture / eval / viz), so the raw kernel is fine.
                x, cls_attn = fused_transformer_block(
                    x, pd, self.num_heads, pol, scale=sc,
                    ln_eps=self.layer_norm_eps, return_cls=True,
                )
                return x, cls_attn
            if deterministic:
                # inference fast path: clip-softmax kernel, no custom-VJP
                # machinery (exact row-max softmax is reserved for the
                # trainable/backward paths — r2 ADVICE). Exact only while
                # |scaled logits| <= 30; one ulp at bf16 in practice.
                return fused_transformer_block(
                    x, pd, self.num_heads, pol, scale=sc,
                    ln_eps=self.layer_norm_eps,
                )
            return fused_transformer_block_trainable(
                x, pd, self.num_heads, pol, sc, self.layer_norm_eps,
                branch_scales,
            )
        else:
            y = nn.LayerNorm(
                epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm1"
            )(x)
            y = Attention(
                num_heads=self.num_heads,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                attn_drop=self.attn_drop,
                proj_drop=self.drop,
                dtype=self.dtype,
                use_fused=self.use_fused,
                name="attn",
            )(y, policy, return_cls_attn=return_cls_attn,
              deterministic=deterministic)
            if return_cls_attn:
                y, cls_attn = y
            x = x + dp(y, deterministic=deterministic)
        mlp_fusable = (
            self.use_fused
            and not self.is_initializing()
            and (deterministic or drops_off)
        )
        if mlp_fusable:
            # one VMEM pass for LN2 -> fc1 -> gelu -> fc2 -> +residual: the
            # (B, N, 4C) fc1 activation never touches HBM in EITHER
            # direction (ops/pallas/mlp.py has a fused backward kernel under
            # the custom VJP), so this path also serves TRAINING whenever
            # dropout/droppath are inactive — which is the reference's
            # default pruning-finetune config (no --drop-path flag exists,
            # utils.py:182-317).
            from dense2sparse_vit_tpu.ops.pallas.mlp import fused_mlp_residual

            p = self.variables["params"]
            x = fused_mlp_residual(
                x,
                p["norm2"]["scale"], p["norm2"]["bias"],
                p["mlp"]["fc1"]["kernel"].astype(self.dtype),
                p["mlp"]["fc1"]["bias"],
                p["mlp"]["fc2"]["kernel"].astype(self.dtype),
                p["mlp"]["fc2"]["bias"],
                self.layer_norm_eps,
            )
        else:
            y = nn.LayerNorm(
                epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm2"
            )(x)
            y = Mlp(
                hidden_features=int(C * self.mlp_ratio),
                drop=self.drop,
                dtype=self.dtype,
                name="mlp",
            )(y, deterministic=deterministic)
            x = x + dp(y, deterministic=deterministic)
        if return_cls_attn:
            return x, cls_attn
        return x


class HybridEmbed(nn.Module):
    """CNN-feature-map patch embedding.

    Parity: reference HybridEmbed (dynamic_vit.py:309-347) — run a CNN
    backbone, flatten its (B, H', W', F) feature map into tokens, and
    project to embed_dim with a 1x1 conv (here a Dense over the feature
    axis, the NHWC equivalent).
    """

    backbone: nn.Module
    embed_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, **backbone_kwargs):
        feats = self.backbone(x.astype(self.dtype), **backbone_kwargs)
        if isinstance(feats, (list, tuple)):
            feats = feats[-1]  # last feature map (dynamic_vit.py:344-345)
        B, H, W, F = feats.shape
        tokens = feats.reshape(B, H * W, F)
        return nn.Dense(
            self.embed_dim, dtype=self.dtype,
            kernel_init=trunc_normal_init, name="proj",
        )(tokens)


class PatchEmbed(nn.Module):
    """Image-to-patch embedding via strided conv.

    Parity: reference PatchEmbed (dynamic_vit.py:286-306); NHWC layout.
    """

    patch_size: int = 16
    embed_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="proj",
        )(x)
        return x.reshape(B, (H // p) * (W // p), self.embed_dim)
