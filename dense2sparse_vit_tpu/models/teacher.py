"""Frozen dense ViT teacher.

Parity: reference VisionTransformerTeacher
(/root/reference/vit_models/dynamic_vit.py:1036-1176): a plain DeiT-shape ViT
whose forward returns (cls_logits, final spatial tokens, per-layer CLS
attention stack) for distillation and mask supervision.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.core.config import ModelConfig
from dense2sparse_vit_tpu.nn.layers import Block, PatchEmbed, trunc_normal_init


class ViTTeacher(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_head: bool = True):
        """Forward.

        Args:
          x: (B, H, W, 3) images (NHWC).

        Returns:
          (logits, tokens, cls_attns): classification logits (B, C),
          final-layer spatial tokens (B, N, D) post-norm, and the stacked
          per-layer CLS attention rows (B, L, H, N+1). CLS attentions are
          stop-gradient, matching the reference's `.detach()`
          (dynamic_vit.py:1165).
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        B = x.shape[0]

        x = PatchEmbed(cfg.patch_size, cfg.embed_dim, dtype, name="patch_embed")(
            x.astype(dtype)
        )
        cls_token = self.param(
            "cls_token", trunc_normal_init, (1, 1, cfg.embed_dim)
        )
        pos_embed = self.param(
            "pos_embed", trunc_normal_init, (1, cfg.num_patches + 1, cfg.embed_dim)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, cfg.embed_dim)).astype(dtype), x],
            axis=1,
        )
        x = x + pos_embed.astype(dtype)
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        cls_attns = []
        for i in range(cfg.depth):
            x, cls_attn = Block(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                qk_scale=cfg.qk_scale,
                drop=cfg.drop_rate,
                attn_drop=cfg.attn_drop_rate,
                drop_path=cfg.drop_path_rate * i / max(cfg.depth - 1, 1),
                layer_norm_eps=cfg.layer_norm_eps,
                dtype=dtype,
                use_fused=cfg.use_fused_attention,
                name=f"blocks_{i}",
            )(x, return_cls_attn=True, deterministic=deterministic)
            cls_attns.append(jax.lax.stop_gradient(cls_attn))

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="norm")(x)
        cls, tokens = x[:, 0], x[:, 1:]
        if return_head:
            logits = nn.Dense(
                cfg.num_classes, dtype=dtype,
                kernel_init=trunc_normal_init, name="head",
            )(cls)
        else:
            logits = cls
        return logits, tokens, jnp.stack(cls_attns, axis=1)

    def cls_attention(self, x, *, deterministic: bool = True):
        """Per-layer CLS attention stack only (B, L, H, N+1).

        Parity: `forward_cls_attention` (dynamic_vit.py:1134-1148).
        """
        _, _, cls_attns = self(x, deterministic=deterministic)
        return cls_attns
