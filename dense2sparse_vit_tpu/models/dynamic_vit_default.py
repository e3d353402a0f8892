"""DynamicViT-paper baseline student (Rao et al.).

Parity: reference default_dynamic_vit.py
(/root/reference/vit_models/default_dynamic_vit.py):
  - 2-class (keep/drop) log-softmax predictor with policy-weighted global
    pooling (:304-330)
  - training: cumulative hard Gumbel-softmax keep decisions
    `gumbel(pred)[..., 0:1] * prev_decision` feeding policy-masked attention
    (:449-459) — shapes never change
  - inference: argsort the keep log-prob, hard-gather top int(N * r) tokens
    (:460-468) — static K on TPU, so this is compile-time shape shrinking

This is the 'gumbel' selection family the reference's flag surface refers to;
the companion DiffPruningStudent covers topk/attn/random/threshold modes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.core.config import ModelConfig, PruningConfig
from dense2sparse_vit_tpu.nn.layers import Block, PatchEmbed, trunc_normal_init
from dense2sparse_vit_tpu.ops.gumbel import gumbel_softmax_keep
from dense2sparse_vit_tpu.ops.topk import gather_tokens, topk_keep_indices


class DynamicViTPredictor(nn.Module):
    """Keep/drop predictor with policy-weighted global pooling
    (default_dynamic_vit.py:304-330)."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, policy):
        """x: (B, N, D) spatial tokens; policy: (B, N, 1) keep decisions.

        Returns (B, N, 2) log-probs over (keep, drop).
        """
        d = self.embed_dim
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="in_norm")(x)
        x = nn.Dense(d, dtype=self.dtype, kernel_init=trunc_normal_init,
                     name="in_dense")(x)
        x = nn.gelu(x, approximate=False)

        local_x = x[:, :, : d // 2]
        # masked mean over kept tokens only
        global_x = jnp.sum(
            x[:, :, d // 2:] * policy, axis=1, keepdims=True
        ) / jnp.maximum(jnp.sum(policy, axis=1, keepdims=True), 1e-6)
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


@flax.struct.dataclass
class DynamicViTOutput:
    logits: jnp.ndarray
    features: jnp.ndarray  # (B, N or K_last, D) final spatial tokens
    # training path: cumulative keep decision after the last stage (B, N, 1)
    decisions: Optional[jnp.ndarray]
    # per-stage keep probabilities exp(logprob_keep) (B, N) — ratio loss input
    pred_keep_probs: Tuple[jnp.ndarray, ...]
    # inference path: composed kept indices in original coords (B, K_last)
    kept_idx_orig: Optional[jnp.ndarray]


class DynamicViTStudent(nn.Module):
    cfg: ModelConfig
    pruning: PruningConfig

    @nn.compact
    def __call__(
        self, x, *, training: bool = False, tau: float = 1.0,
        deterministic: Optional[bool] = None, unpruned: bool = False,
    ) -> DynamicViTOutput:
        """unpruned: run every block dense (no gumbel policy, no gather) —
        the baseline side of the pruned-vs-unpruned eval comparison
        (evaluate.py:36-40 intent). Predictor scores are still computed so
        the parameter structure is identical either way."""
        cfg, pr = self.cfg, self.pruning
        if deterministic is None:
            deterministic = not training
        dtype = jnp.dtype(cfg.dtype)
        B = x.shape[0]
        N = cfg.num_patches
        keep_counts = pr.keep_counts(N)

        x = PatchEmbed(cfg.patch_size, cfg.embed_dim, dtype, name="patch_embed")(
            x.astype(dtype)
        )
        cls_token = self.param("cls_token", trunc_normal_init, (1, 1, cfg.embed_dim))
        pos_embed = self.param(
            "pos_embed", trunc_normal_init, (1, N + 1, cfg.embed_dim)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, cfg.embed_dim)).astype(dtype), x],
            axis=1,
        )
        x = x + pos_embed.astype(dtype)
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        prev_decision = jnp.ones((B, N, 1), dtype)
        policy_full = None
        pred_keep_probs = []
        cur_orig_idx = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None], (B, N)
        )
        p = 0

        for i in range(cfg.depth):
            blk = Block(
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
            quant=cfg.quant,
                name=f"blocks_{i}",
            )
            if i in pr.pruning_locs:
                spatial = x[:, 1:]
                pred = DynamicViTPredictor(
                    cfg.embed_dim, dtype, name=f"score_predictor_{p}"
                )(spatial, prev_decision)
                keep_logprob = pred[..., 0]
                pred_keep_probs.append(jnp.exp(keep_logprob))
                if unpruned:
                    x = blk(x, deterministic=deterministic)
                elif training:
                    # cumulative hard gumbel decision, policy-masked attention
                    # (default_dynamic_vit.py:454-459)
                    prev_decision = gumbel_softmax_keep(
                        self.make_rng("gumbel"), pred, prev_decision, tau=tau
                    )
                    cls_ones = jnp.ones((B, 1, 1), prev_decision.dtype)
                    policy_full = jnp.concatenate(
                        [cls_ones, prev_decision], axis=1
                    )[..., 0]
                    x = blk(x, policy=policy_full, deterministic=deterministic)
                else:
                    # hard top-K gather with static K
                    # (default_dynamic_vit.py:461-468)
                    k = keep_counts[p]
                    kept, _ = topk_keep_indices(keep_logprob, k)
                    cur_orig_idx = jnp.take_along_axis(cur_orig_idx, kept, axis=-1)
                    idx_full = jnp.concatenate(
                        [jnp.zeros((B, 1), kept.dtype), kept + 1], axis=1
                    )
                    x = gather_tokens(x, idx_full)
                    # decisions shrink too: surviving tokens are all kept
                    prev_decision = jnp.ones((B, k, 1), dtype)
                    x = blk(x, deterministic=deterministic)
                p += 1
            else:
                x = blk(
                    x,
                    policy=policy_full if training else None,
                    deterministic=deterministic,
                )

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, name="norm")(x)
        features = x[:, 1:]
        logits = nn.Dense(
            cfg.num_classes, dtype=dtype, kernel_init=trunc_normal_init,
            name="head",
        )(x[:, 0])
        return DynamicViTOutput(
            logits=logits,
            features=features,
            decisions=prev_decision if training else None,
            pred_keep_probs=tuple(pred_keep_probs),
            kept_idx_orig=None if training else cur_orig_idx,
        )
