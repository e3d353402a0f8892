"""DINO family: self-supervised ViT backbones + pruning variants.

Parity: reference dino.py (/root/reference/vit_models/dino.py):
  - `DINOViT` — DINO-pretrained backbone (patch 16 or 8), classification head
    optional, last-layer self-attention exposure (:287-337)
  - `DINOPredictorViT` — a single pruning stage with a 2-class log-softmax
    predictor: Gumbel policy-masking in training, hard top-0.7 gather at
    eval (:368-410; the reference's eval path has a dtype bug at :403 —
    `dtype=x.type` — whose intent we implement)
  - `DINODistilledViT` — extra "shape" (dist) token, used by the
    shape-distilled checkpoints of the "Intriguing Properties" release
    (:412-451)
  - `DINOMaskedViT` — external (N, 2) mask logits -> Gumbel keep decisions,
    per-layer CLS logits list + keep decisions returned (:454-500)
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.models.deit import _DeiTBase
from dense2sparse_vit_tpu.nn.layers import trunc_normal_init
from dense2sparse_vit_tpu.ops.gumbel import gumbel_softmax
from dense2sparse_vit_tpu.ops.topk import gather_tokens, topk_keep_indices


class _DinoPredictor(nn.Module):
    """2-class log-softmax local/global predictor (dino.py:340-366)."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.embed_dim
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="in_norm")(x)
        x = nn.Dense(d, dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="in_dense")(x)
        x = nn.gelu(x, approximate=False)
        local_x = x[:, :, : d // 2]
        global_x = jnp.mean(x[:, :, d // 2:], axis=1, keepdims=True)
        x = jnp.concatenate(
            [local_x, jnp.broadcast_to(global_x, local_x.shape[:2] + (d - d // 2,))],
            axis=-1,
        )
        x = nn.Dense(d // 2, dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="out_0")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(d // 4, dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="out_1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(2, dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="out_2")(x)
        return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1).astype(x.dtype)


class DINOViT(_DeiTBase):
    """Plain DINO backbone; returns CLS feature (num_classes=0) or logits."""

    @nn.compact
    def __call__(
        self,
        x,
        *,
        deterministic: bool = True,
        return_selfattention: bool = False,
    ):
        cls_token = self.param(
            "cls_token", trunc_normal_init, (1, 1, self.cfg.embed_dim)
        )
        x = self._embed(x, [cls_token], deterministic)
        for i in range(self.cfg.depth):
            if return_selfattention and i == self.cfg.depth - 1:
                _, cls_attn = self._block(i)(
                    x, return_cls_attn=True, deterministic=deterministic
                )
                return cls_attn
            x = self._block(i)(x, deterministic=deterministic)
        x = self._norm()(x)
        cls = x[:, 0]
        if self.cfg.num_classes > 0:
            return self._head()(cls)
        return cls


class DINOPredictorViT(_DeiTBase):
    """Single-stage pruning DINO (dino.py:368-410)."""

    pruning_location: int = 0
    keep_ratio: float = 0.7

    @nn.compact
    def __call__(self, x, *, training: bool = False, deterministic=None):
        if deterministic is None:
            deterministic = not training
        cfg = self.cfg
        cls_token = self.param("cls_token", trunc_normal_init, (1, 1, cfg.embed_dim))
        x = self._embed(x, [cls_token], deterministic)
        B = x.shape[0]
        policy = None
        keep_decisions = None
        for i in range(cfg.depth):
            if i == self.pruning_location:
                pred = _DinoPredictor(
                    cfg.embed_dim, jnp.dtype(cfg.dtype), name="predictor"
                )(x[:, 1:])
                if training:
                    keep_decisions = gumbel_softmax(
                        self.make_rng("gumbel"), pred, hard=True
                    )[..., 0:1]
                    ones = jnp.ones((B, 1, 1), keep_decisions.dtype)
                    policy = jnp.concatenate([ones, keep_decisions], axis=1)[..., 0]
                else:
                    score = pred[..., 0]
                    k = int(self.keep_ratio * score.shape[1])
                    kept, _ = topk_keep_indices(score, k)
                    idx_full = jnp.concatenate(
                        [jnp.zeros((B, 1), kept.dtype), kept + 1], axis=1
                    )
                    x = gather_tokens(x, idx_full)
            x = self._block(i)(x, policy=policy, deterministic=deterministic)
        x = self._norm()(x)
        cls = x[:, 0]
        out = self._head()(cls) if cfg.num_classes > 0 else cls
        return out, keep_decisions


class DINODistilledViT(_DeiTBase):
    """DINO backbone with an extra shape/dist token (dino.py:412-451)."""

    num_extra_tokens: int = 2

    @nn.compact
    def __call__(
        self,
        x,
        *,
        deterministic: bool = True,
        return_selfattention: bool = False,
    ):
        d = self.cfg.embed_dim
        cls_token = self.param("cls_token", trunc_normal_init, (1, 1, d))
        dist_token = self.param("dist_token", trunc_normal_init, (1, 1, d))
        x = self._embed(x, [cls_token, dist_token], deterministic)
        for i in range(self.cfg.depth):
            if return_selfattention and i == self.cfg.depth - 1:
                _, cls_attn = self._block(i)(
                    x, return_cls_attn=True, deterministic=deterministic
                )
                return cls_attn
            x = self._block(i)(x, deterministic=deterministic)
        x = self._norm()(x)
        if self.cfg.num_classes > 0:
            return self._head("head")(x[:, 0]), self._head("head_dist")(x[:, 1])
        return x[:, 0], x[:, 1]


class DINOMaskedViT(_DeiTBase):
    """External-mask DINO: per-layer CLS logits + keep decisions
    (dino.py:454-500)."""

    @nn.compact
    def __call__(
        self,
        x,
        mask_logits: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        cls_token = self.param("cls_token", trunc_normal_init, (1, 1, cfg.embed_dim))
        x = self._embed(x, [cls_token], deterministic)
        B = x.shape[0]
        keep_decisions = None
        if mask_logits is not None:
            logits = jax.nn.log_softmax(
                jnp.broadcast_to(mask_logits[None], (B,) + mask_logits.shape)
                .astype(jnp.float32),
                axis=-1,
            )
            patch_keep = gumbel_softmax(
                self.make_rng("gumbel"), logits, hard=True
            )[..., 0:1]
            ones = jnp.ones((B, 1, 1), patch_keep.dtype)
            keep_decisions = jnp.concatenate([ones, patch_keep], axis=1)
        layer_logits = []
        norm = self._norm()
        head = self._head()
        for i in range(cfg.depth):
            x = self._block(i)(x, deterministic=deterministic)
            layer_logits.append(head(norm(x)[:, 0]))
        return tuple(layer_logits), keep_decisions
