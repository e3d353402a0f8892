"""DeiT family: vanilla / distilled / masked / inline-predictor variants.

Parity: reference deit.py (/root/reference/vit_models/deit.py):
  - `DeiT` — plain backbone with `forward_selfattention` (last-layer
    attention map, :298-348) and arbitrary-resolution position-embedding
    interpolation (:282-296)
  - `DistilledDeiT` — CLS + distillation token, optional per-layer
    (cls, dist) capture (:418-447)
  - `VanillaDeiT` — per-layer CLS logits list + random block-level patch
    drop via (block_index, drop_rate) (:450-510)
  - `NonSpatialDeiT` — no position embedding (:513-532)
  - `MaskedDistilledDeiT` — EXTERNAL per-patch mask logits -> Gumbel keep
    decisions zeroing tokens from a chosen block onward (:534-585); this is
    the backbone of the direct mask-logit optimization experiment
    (optimized_mask.py)
  - `MaskPredictorDeiT` — inline 2-layer predictor + Gumbel at the
    penultimate block (:587-639)
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.core.config import ModelConfig
from dense2sparse_vit_tpu.nn.layers import Block, PatchEmbed, trunc_normal_init
from dense2sparse_vit_tpu.ops.gumbel import gumbel_softmax


def interpolate_pos_encoding(
    pos_embed: jnp.ndarray, n_spatial: int, n_extra: int = 1
) -> jnp.ndarray:
    """Resize the grid part of (1, n_extra + N_old, D) to n_spatial tokens.

    Parity: deit.py:282-296 / dino.py:271-285 (bicubic there; bilinear here,
    matching the checkpoint-filter path the reference actually exercises at
    dynamic_vit.py:1192). Shapes are static at trace time, so this is
    XLA-friendly.
    """
    n_old = pos_embed.shape[1] - n_extra
    if n_old == n_spatial:
        return pos_embed
    extra = pos_embed[:, :n_extra]
    grid = pos_embed[0, n_extra:]
    gs_old = int(round(n_old ** 0.5))
    gs_new = int(round(n_spatial ** 0.5))
    D = grid.shape[-1]
    resized = jax.image.resize(
        grid.reshape(gs_old, gs_old, D),
        (gs_new, gs_new, D),
        method="bilinear",  # half-pixel centers == align_corners=False
    ).reshape(1, gs_new * gs_new, D)
    return jnp.concatenate([extra, resized], axis=1)


@functools.lru_cache(maxsize=64)
def _crop_apply_fn(model, kwargs_items):
    """One stable jitted apply per (model, kwargs): jax's compile cache keys
    on function identity, so a fresh lambda per call would retrace every
    time. flax Modules are frozen dataclasses, hence hashable cache keys."""
    kw = dict(kwargs_items)
    return jax.jit(lambda v, x: model.apply(v, x, **kw))


def forward_crops(model, variables, crops, **apply_kwargs):
    """Multi-crop forward: group crops by resolution, run one jitted forward
    per group, concatenate outputs in the original order.

    Parity: the reference's multi-crop forward (deit.py:241-263,
    dino.py:230-252) — torch groups consecutive same-resolution crops with
    cumsum/unique_consecutive; here each distinct resolution is a separate
    static-shape jit, compiled once per (model, kwargs, resolution) and
    cached across calls.

    Args:
      crops: list of (B_i, H_i, W_i, 3) arrays.

    Returns list of per-crop outputs, same order as `crops`.
    """
    import collections

    groups = collections.defaultdict(list)
    for i, c in enumerate(crops):
        groups[c.shape[1:3]].append(i)
    fn = _crop_apply_fn(model, tuple(sorted(apply_kwargs.items())))
    outputs = [None] * len(crops)
    for _, idxs in groups.items():
        batch = jnp.concatenate([crops[i] for i in idxs], axis=0)
        out = fn(variables, batch)
        sizes = [crops[i].shape[0] for i in idxs]
        offset = 0
        for i, s in zip(idxs, sizes):
            outputs[i] = jax.tree_util.tree_map(
                lambda t: t[offset:offset + s], out
            )
            offset += s
    return outputs


class _DeiTBase(nn.Module):
    """Shared embed + encoder machinery."""

    cfg: ModelConfig
    num_extra_tokens: int = 1  # CLS (+ dist)
    use_pos_embed: bool = True

    def _embed(self, x, extra_tokens, deterministic):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        B = x.shape[0]
        x = PatchEmbed(cfg.patch_size, cfg.embed_dim, dtype, name="patch_embed")(
            x.astype(dtype)
        )
        n_spatial = x.shape[1]
        toks = [
            jnp.broadcast_to(t, (B, 1, cfg.embed_dim)).astype(dtype)
            for t in extra_tokens
        ]
        x = jnp.concatenate(toks + [x], axis=1)
        if self.use_pos_embed:
            pos_embed = self.param(
                "pos_embed",
                trunc_normal_init,
                (1, cfg.num_patches + self.num_extra_tokens, cfg.embed_dim),
            )
            pe = interpolate_pos_encoding(
                pos_embed, n_spatial, self.num_extra_tokens
            )
            x = x + pe.astype(dtype)
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)
        return x

    def _block(self, i):
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
        )

    def _norm(self):
        return nn.LayerNorm(
            epsilon=self.cfg.layer_norm_eps,
            dtype=jnp.dtype(self.cfg.dtype),
            name="norm",
        )

    def _head(self, name="head"):
        return nn.Dense(
            self.cfg.num_classes,
            dtype=jnp.dtype(self.cfg.dtype),
            kernel_init=trunc_normal_init,
            name=name,
        )


class DeiT(_DeiTBase):
    """Plain DeiT backbone (deit.py:159-415)."""

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
                # expose the full last-layer attention map (deit.py:298-348)
                _, cls_attn = self._block(i)(
                    x, return_cls_attn=True, deterministic=deterministic
                )
                return cls_attn
            x = self._block(i)(x, deterministic=deterministic)
        x = self._norm()(x)
        return self._head()(x[:, 0])


class DistilledDeiT(_DeiTBase):
    """CLS + dist token DeiT (deit.py:418-447)."""

    num_extra_tokens: int = 2

    @nn.compact
    def __call__(
        self, x, *, deterministic: bool = True, return_per_layer: bool = False
    ):
        d = self.cfg.embed_dim
        cls_token = self.param("cls_token", trunc_normal_init, (1, 1, d))
        dist_token = self.param("dist_token", trunc_normal_init, (1, 1, d))
        x = self._embed(x, [cls_token, dist_token], deterministic)
        per_layer: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
        for i in range(self.cfg.depth):
            x = self._block(i)(x, deterministic=deterministic)
            if return_per_layer:
                per_layer.append((x[:, 0], x[:, 1]))
        x = self._norm()(x)
        cls_logits = self._head("head")(x[:, 0])
        dist_logits = self._head("head_dist")(x[:, 1])
        if return_per_layer:
            return cls_logits, dist_logits, tuple(per_layer)
        # eval-time fusion: mean of the two heads (timm DeiT convention)
        return cls_logits, dist_logits


class VanillaDeiT(_DeiTBase):
    """Per-layer CLS logits + random block-level patch drop (deit.py:450-510)."""

    @nn.compact
    def __call__(
        self,
        x,
        *,
        deterministic: bool = True,
        drop_best: bool = False,
        block_index: int = 0,
        drop_rate: float = 0.0,
    ):
        cfg = self.cfg
        cls_token = self.param("cls_token", trunc_normal_init, (1, 1, cfg.embed_dim))
        x = self._embed(x, [cls_token], deterministic)
        layer_logits = []
        norm = self._norm()
        head = self._head()
        for i in range(cfg.depth):
            if drop_rate > 0.0 and i == block_index:
                # randomly drop a fraction of patch tokens at this block
                # (deit.py:478-495); static K = ceil(N * (1 - rate))
                B, n_tok, D = x.shape
                n_sp = n_tok - 1
                keep = n_sp - int(n_sp * drop_rate)
                scores = jax.random.uniform(
                    self.make_rng("patch_drop"), (B, n_sp)
                )
                _, idx = jax.lax.top_k(scores, keep)
                idx = jnp.sort(idx, axis=-1)
                idx_full = jnp.concatenate(
                    [jnp.zeros((B, 1), idx.dtype), idx + 1], axis=1
                )
                x = jnp.take_along_axis(x, idx_full[..., None], axis=1)
            x = self._block(i)(x, deterministic=deterministic)
            layer_logits.append(head(norm(x)[:, 0]))
        return tuple(layer_logits)


class NonSpatialDeiT(_DeiTBase):
    """No position embedding (deit.py:513-532)."""

    use_pos_embed: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cls_token = self.param(
            "cls_token", trunc_normal_init, (1, 1, self.cfg.embed_dim)
        )
        x = self._embed(x, [cls_token], deterministic)
        for i in range(self.cfg.depth):
            x = self._block(i)(x, deterministic=deterministic)
        x = self._norm()(x)
        return self._head()(x[:, 0])


class MaskedDistilledDeiT(_DeiTBase):
    """Distilled DeiT with EXTERNAL per-patch mask logits (deit.py:534-585).

    The (N, 2) mask logits (a trainable tensor outside the model — see
    optimized_mask.py:200-228) become hard Gumbel keep decisions; dropped
    tokens are zeroed from `mask_block` onward. The ViT itself stays frozen.
    """

    num_extra_tokens: int = 2
    mask_block: int = 7

    @nn.compact
    def __call__(
        self,
        x,
        mask_logits: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        tau: float = 1.0,
        hard: bool = True,
    ):
        d = self.cfg.embed_dim
        cls_token = self.param("cls_token", trunc_normal_init, (1, 1, d))
        dist_token = self.param("dist_token", trunc_normal_init, (1, 1, d))
        x = self._embed(x, [cls_token, dist_token], deterministic)
        B = x.shape[0]
        keep = None
        if mask_logits is not None:
            logits = jnp.broadcast_to(
                mask_logits[None], (B,) + mask_logits.shape
            )
            keep = gumbel_softmax(
                self.make_rng("gumbel"), logits, tau=tau, hard=hard
            )[..., 0:1]  # (B, N, 1)
        for i in range(self.cfg.depth):
            if keep is not None and i == self.mask_block:
                ones = jnp.ones((B, 2, 1), keep.dtype)
                x = x * jnp.concatenate([ones, keep], axis=1).astype(x.dtype)
            x = self._block(i)(x, deterministic=deterministic)
        x = self._norm()(x)
        cls_logits = self._head("head")(x[:, 0])
        dist_logits = self._head("head_dist")(x[:, 1])
        return cls_logits, dist_logits, keep


class MaskPredictorDeiT(_DeiTBase):
    """Inline 2-layer predictor + Gumbel keep at the penultimate block
    (deit.py:587-639)."""

    num_extra_tokens: int = 2
    mask_block: Optional[int] = None  # default: depth - 2

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, tau: float = 1.0):
        cfg = self.cfg
        d = cfg.embed_dim
        cls_token = self.param("cls_token", trunc_normal_init, (1, 1, d))
        dist_token = self.param("dist_token", trunc_normal_init, (1, 1, d))
        x = self._embed(x, [cls_token, dist_token], deterministic)
        B = x.shape[0]
        mask_block = (
            self.mask_block if self.mask_block is not None else cfg.depth - 2
        )
        keep = None
        for i in range(cfg.depth):
            if i == mask_block:
                h = nn.Dense(
                    d // 2, dtype=x.dtype, kernel_init=trunc_normal_init,
                    name="predictor_fc1",
                )(x[:, 2:])
                h = nn.gelu(h, approximate=False)
                logits = nn.Dense(
                    2, dtype=x.dtype, kernel_init=trunc_normal_init,
                    name="predictor_fc2",
                )(h)
                keep = gumbel_softmax(
                    self.make_rng("gumbel"), logits.astype(jnp.float32),
                    tau=tau, hard=True,
                )[..., 0:1]
                ones = jnp.ones((B, 2, 1), keep.dtype)
                x = x * jnp.concatenate([ones, keep], axis=1).astype(x.dtype)
            x = self._block(i)(x, deterministic=deterministic)
        x = self._norm()(x)
        cls_logits = self._head("head")(x[:, 0])
        dist_logits = self._head("head_dist")(x[:, 1])
        return cls_logits, dist_logits, keep
