"""Transformer-in-Transformer (TNT).

Parity: reference tnt.py (/root/reference/vit_models/tnt.py): dual
inner(pixel)/outer(patch) attention per block; inner pixel tokens are
projected and ADDED to the patch embeddings each block (:75-114); PixelEmbed
extracts per-patch pixel tokens via conv + unfold (:117-142); tnt_s / tnt_b
factories (:230-249). TNT attention computes q/k at `hidden_dim` but v at
`dim` (tnt.py:45-73).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.core.config import ModelConfig
from dense2sparse_vit_tpu.nn.layers import Mlp, trunc_normal_init
from dense2sparse_vit_tpu.nn.t2t import unfold


class TNTAttention(nn.Module):
    """qk at hidden_dim, v at dim (tnt.py:41-73)."""

    hidden_dim: int
    num_heads: int
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        hd = self.hidden_dim // self.num_heads
        qk = nn.Dense(2 * self.hidden_dim, use_bias=self.qkv_bias,
                      dtype=self.dtype, kernel_init=trunc_normal_init,
                      name="qk")(x)
        qk = qk.reshape(B, N, 2, self.num_heads, hd)
        q, k = qk[:, :, 0].transpose(0, 2, 1, 3), qk[:, :, 1].transpose(0, 2, 1, 3)
        v = nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="v")(x)
        v = v.reshape(B, N, self.num_heads, -1).transpose(0, 2, 1, 3)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * hd ** -0.5
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init,
                        name="proj")(out)


class TNT(nn.Module):
    """TNT backbone (tnt.py:144-228)."""

    cfg: ModelConfig
    in_dim: int = 24  # inner (pixel) token width
    in_num_head: int = 4
    first_stride: int = 4

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        B = x.shape[0]
        num_patches = cfg.num_patches
        new_ps = -(-cfg.patch_size // self.first_stride)  # ceil
        num_pixel = new_ps * new_ps

        # PixelEmbed: conv stride 4 then per-patch unfold (tnt.py:117-142)
        y = nn.Conv(self.in_dim, (7, 7), strides=(self.first_stride,) * 2,
                    padding=[(3, 3), (3, 3)], dtype=dtype,
                    kernel_init=trunc_normal_init, name="pixel_embed_proj")(
            x.astype(dtype)
        )
        # (B, H', W', in_dim) -> per-patch pixel tokens
        patches = unfold(y, new_ps, new_ps, 0)  # (B, P, in_dim*np*np)
        # torch ordering after unfold is channel-major (c, i, j); reshape to
        # (B*P, c, np, np) then to tokens (B*P, np*np, c)
        pix = patches.reshape(B * num_patches, self.in_dim, new_ps, new_ps)
        pixel_pos = self.param(
            "pixel_pos", trunc_normal_init, (1, self.in_dim, new_ps, new_ps)
        )
        pix = pix + pixel_pos.astype(dtype)
        pixel_embed = pix.reshape(B * num_patches, self.in_dim, num_pixel)
        pixel_embed = pixel_embed.transpose(0, 2, 1)  # (B*P, np*np, in_dim)

        # patch embeddings from normalized pixel tokens (tnt.py:211-214)
        pe = pixel_embed.reshape(B, num_patches, -1)
        pe = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                          name="norm1_proj")(pe)
        pe = nn.Dense(cfg.embed_dim, dtype=dtype,
                      kernel_init=trunc_normal_init, name="proj")(pe)
        pe = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                          name="norm2_proj")(pe)
        cls_token = self.param("cls_token", trunc_normal_init,
                               (1, 1, cfg.embed_dim))
        patch_embed = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, cfg.embed_dim)).astype(dtype), pe],
            axis=1,
        )
        patch_pos = self.param("patch_pos", trunc_normal_init,
                               (1, num_patches + 1, cfg.embed_dim))
        patch_embed = patch_embed + patch_pos.astype(dtype)
        patch_embed = nn.Dropout(cfg.drop_rate)(
            patch_embed, deterministic=deterministic
        )

        for i in range(cfg.depth):
            # inner transformer on pixel tokens
            y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                             name=f"blocks_{i}_norm_in")(pixel_embed)
            pixel_embed = pixel_embed + TNTAttention(
                self.in_dim, self.in_num_head, cfg.qkv_bias, dtype,
                name=f"blocks_{i}_attn_in",
            )(y)
            y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                             name=f"blocks_{i}_norm_mlp_in")(pixel_embed)
            pixel_embed = pixel_embed + Mlp(
                self.in_dim * 4, out_features=self.in_dim, dtype=dtype,
                name=f"blocks_{i}_mlp_in",
            )(y, deterministic=deterministic)
            # inner -> outer projection added to patch embeds (tnt.py:111)
            y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                             name=f"blocks_{i}_norm1_proj")(pixel_embed)
            inject = nn.Dense(
                cfg.embed_dim, dtype=dtype, kernel_init=trunc_normal_init,
                name=f"blocks_{i}_proj",
            )(y.reshape(B, num_patches, -1))
            patch_embed = patch_embed.at[:, 1:].add(inject)
            # outer transformer on patch tokens
            y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                             name=f"blocks_{i}_norm_out")(patch_embed)
            patch_embed = patch_embed + TNTAttention(
                cfg.embed_dim, cfg.num_heads, cfg.qkv_bias, dtype,
                name=f"blocks_{i}_attn_out",
            )(y)
            y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                             name=f"blocks_{i}_norm_mlp")(patch_embed)
            patch_embed = patch_embed + Mlp(
                int(cfg.embed_dim * cfg.mlp_ratio), dtype=dtype,
                name=f"blocks_{i}_mlp",
            )(y, deterministic=deterministic)

        patch_embed = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                                   name="norm")(patch_embed)
        return nn.Dense(cfg.num_classes, dtype=dtype,
                        kernel_init=trunc_normal_init, name="head")(
            patch_embed[:, 0]
        )
