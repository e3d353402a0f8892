"""T2T-ViT family: Tokens-to-Token ViT and its SE / Ghost / Dense variants.

Parity:
  - T2T_ViT (/root/reference/vit_models/t2t_vit.py:106-179): T2T stem, fixed
    sinusoid position embedding (:119), per-block normed outputs
    ("block_heads") and `get_average` head averaging (:156-179). Factories
    T2t_vit_7/10/12/14/19/24, t-variants, resnext/wide (:181-301).
  - T2T_ViT_SE (/root/reference/vit_models/t2t_vit_se.py): squeeze-excitation
    channel gating after the attention projection (:22-69).
  - T2T_ViT_Ghost (/root/reference/vit_models/t2t_vit_ghost.py): half-width
    q/k/v + depthwise "cheap" completions (:56-96); ghost MLP producing
    x1||x2||x3 (:24-54).
  - T2T_ViT_Dense (/root/reference/vit_models/t2t_vit_dense.py): DenseNet
    growth — each block appends `dense_linear(new_x)` channels, Transition
    halves dims between stages (:60-113).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.core.config import ModelConfig
from dense2sparse_vit_tpu.nn.layers import Block, Mlp, trunc_normal_init
from dense2sparse_vit_tpu.nn.t2t import T2TModule, get_sinusoid_encoding


class _T2TBase(nn.Module):
    cfg: ModelConfig
    tokens_type: str = "performer"
    token_dim: int = 64

    def _stem(self, x, deterministic):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        B = x.shape[0]
        x = T2TModule(
            embed_dim=cfg.embed_dim,
            tokens_type=self.tokens_type,
            token_dim=self.token_dim,
            dtype=dtype,
            name="tokens_to_token",
        )(x, deterministic=deterministic)
        cls_token = self.param(
            "cls_token", trunc_normal_init, (1, 1, cfg.embed_dim)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, cfg.embed_dim)).astype(dtype), x],
            axis=1,
        )
        # FIXED sinusoid position embedding (t2t_vit.py:119) — a constant,
        # not a parameter
        pe = get_sinusoid_encoding(x.shape[1], cfg.embed_dim)
        x = x + jnp.asarray(pe, dtype)
        return nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

    def _block(self, i, **kw):
        cfg = self.cfg
        return Block(
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio,
            qkv_bias=cfg.qkv_bias,
            qk_scale=cfg.qk_scale,
            drop=cfg.drop_rate,
            attn_drop=cfg.attn_drop_rate,
            drop_path=cfg.drop_path_rate * i / max(cfg.depth - 1, 1),
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=jnp.dtype(cfg.dtype),
            use_fused=cfg.use_fused_attention,
        quant=cfg.quant,
            name=f"blocks_{i}",
            **kw,
        )


class T2TViT(_T2TBase):
    """Tokens-to-Token ViT with per-block heads (t2t_vit.py:106-179)."""

    @nn.compact
    def __call__(
        self, x, *, deterministic: bool = True, get_average: bool = False
    ):
        cfg = self.cfg
        x = self._stem(x, deterministic)
        norm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.dtype(cfg.dtype), name="norm"
        )
        head = nn.Dense(
            cfg.num_classes, dtype=jnp.dtype(cfg.dtype),
            kernel_init=trunc_normal_init, name="head",
        )
        block_cls = []
        for i in range(cfg.depth):
            x = self._block(i)(x, deterministic=deterministic)
            if get_average:
                block_cls.append(norm(x)[:, 0])
        x = norm(x)
        if get_average:
            # mean of per-block head logits (t2t_vit.py:175-177)
            return jnp.mean(jnp.stack([head(c) for c in block_cls], 0), axis=0)
        return head(x[:, 0])


class _SEAttention(nn.Module):
    """Attention with squeeze-excitation gating (t2t_vit_se.py:22-69)."""

    num_heads: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=False, dtype=self.dtype,
                       kernel_init=trunc_normal_init, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * hd ** -0.5
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init,
                       name="proj")(out)
        # SE: token-mean pooled channel gate (t2t_vit_se.py:22-40)
        y = jnp.mean(out, axis=1)  # (B, C)
        y = nn.Dense(C // self.reduction, use_bias=False, dtype=self.dtype,
                     name="se_fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(C, use_bias=False, dtype=self.dtype, name="se_fc2")(y)
        y = jax.nn.sigmoid(y)
        return out * y[:, None, :]


class T2TViTSE(_T2TBase):
    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = self._stem(x, deterministic)
        for i in range(cfg.depth):
            y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                             name=f"blocks_{i}_norm1")(x)
            x = x + _SEAttention(cfg.num_heads, dtype=dtype,
                                 name=f"blocks_{i}_attn")(y)
            y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                             name=f"blocks_{i}_norm2")(x)
            x = x + Mlp(int(cfg.embed_dim * cfg.mlp_ratio), dtype=dtype,
                        name=f"blocks_{i}_mlp")(y, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="norm")(x)
        return nn.Dense(cfg.num_classes, dtype=dtype,
                        kernel_init=trunc_normal_init, name="head")(x[:, 0])


def _cheap(module, x, name):
    """Depthwise 1x1 'cheap operation' == learned per-channel scale
    (t2t_vit_ghost.py: Conv1d(groups=channels, kernel=1, no bias))."""
    w = module.param(name, nn.initializers.ones, (x.shape[-1],))
    return x * w


class _GhostAttention(nn.Module):
    """Half-width q/k/v + cheap completions (t2t_vit_ghost.py:56-96)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        hd = C // self.num_heads
        half = C // 2
        q = nn.Dense(half, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(half, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(half, use_bias=False, dtype=self.dtype, name="v")(x)
        q = jnp.concatenate([q, _cheap(self, q, "cheap_q")], -1)
        k = jnp.concatenate([k, _cheap(self, k, "cheap_k")], -1)
        v = jnp.concatenate([v, _cheap(self, v, "cheap_v")], -1)

        def heads(t):
            return t.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * hd ** -0.5
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init,
                        name="proj")(out)


class _GhostMlp(nn.Module):
    """x1 || cheap2(x1) || cheap3(x1) -> fc2 (t2t_vit_ghost.py:24-54)."""

    hidden_ratio: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x1 = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init,
                      name="fc1")(x)
        x1 = nn.gelu(x1, approximate=False)
        x2 = nn.gelu(_cheap(self, x1, "cheap2"), approximate=False)
        x3 = nn.gelu(_cheap(self, x1, "cheap3"), approximate=False)
        x = jnp.concatenate([x1, x2, x3], axis=-1)
        return nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init,
                        name="fc2")(x)


class T2TViTGhost(_T2TBase):
    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = self._stem(x, deterministic)
        for i in range(cfg.depth):
            y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                             name=f"blocks_{i}_norm1")(x)
            x = x + _GhostAttention(cfg.num_heads, dtype=dtype,
                                    name=f"blocks_{i}_attn")(y)
            y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                             name=f"blocks_{i}_norm2")(x)
            x = x + _GhostMlp(int(cfg.mlp_ratio), dtype=dtype,
                              name=f"blocks_{i}_mlp")(y)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="norm")(x)
        return nn.Dense(cfg.num_classes, dtype=dtype,
                        kernel_init=trunc_normal_init, name="head")(x[:, 0])


class T2TViTDense(_T2TBase):
    """DenseNet-style channel growth (t2t_vit_dense.py:60-113)."""

    growth_rate: int = 64
    block_config: Tuple[int, ...] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = self._stem(x, deterministic)
        idx = 0
        for s, num_layers in enumerate(self.block_config):
            for j in range(num_layers):
                dim = x.shape[-1]
                y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                                 name=f"blocks_{idx}_norm1")(x)
                qkv_attn = Block(
                    num_heads=cfg.num_heads,
                    mlp_ratio=cfg.mlp_ratio,
                    qkv_bias=cfg.qkv_bias,
                    layer_norm_eps=cfg.layer_norm_eps,
                    dtype=dtype,
                    name=f"blocks_{idx}_inner",
                )
                new_x = qkv_attn(x, deterministic=deterministic)
                new_x = nn.Dense(
                    self.growth_rate, dtype=dtype,
                    kernel_init=trunc_normal_init, name=f"blocks_{idx}_dense",
                )(new_x)
                x = jnp.concatenate([x, new_x], axis=-1)
                idx += 1
            if s != len(self.block_config) - 1:
                # Transition: LN + Linear halving channels
                dim = x.shape[-1]
                x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                                 name=f"transition_{s}_norm")(x)
                x = nn.Dense(dim // 2, dtype=dtype,
                             kernel_init=trunc_normal_init,
                             name=f"transition_{s}_dense")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="norm")(x)
        return nn.Dense(cfg.num_classes, dtype=dtype,
                        kernel_init=trunc_normal_init, name="head")(x[:, 0])
