"""Hierarchical and ensemble DeiT: per-layer conv heads + quadrant heads.

Parity:
  - deit_modified.py (/root/reference/vit_models/deit_modified.py):
    `TransformerHead` — conv+BN residual unit over the patch grid, global
    average pooled, added to an fc of the CLS token (:17-59);
    `VisionTransformer_hierarchical` attaches heads to layers 0..10 and
    returns 12 logits (:62-121).
  - deit_ensemble.py (/root/reference/vit_models/deit_ensemble.py):
    same TransformerHeads plus 4 `FinalHead`s over 49-patch quadrants;
    returns 16 logits or their mean (:74-115).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dense2sparse_vit_tpu.models.deit import _DeiTBase
from dense2sparse_vit_tpu.nn.layers import trunc_normal_init


class TransformerHead(nn.Module):
    """Conv head over the patch grid + CLS fc (deit_modified.py:17-59).

    Note the reference assigns `self.conv`/`self.bn` twice, so one conv/bn
    pair is shared by both applications — replicated here.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True):
        B, n_tok, D = x.shape
        cls_token, patches = x[:, 0], x[:, 1:]
        size = int(round((n_tok - 1) ** 0.5))
        grid = patches.reshape(B, size, size, D)

        conv = nn.Conv(D, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                       dtype=self.dtype, name="conv")
        bn = nn.BatchNorm(use_running_average=use_running_average,
                          momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                          name="bn")
        feats = nn.relu(bn(conv(grid)))
        feats = bn(conv(feats))
        feats = feats + grid  # identity shortcut (expansion == 1)
        feats = nn.relu(feats)
        pooled = jnp.mean(feats, axis=(1, 2))  # global average pool
        cls_out = nn.Dense(D, dtype=self.dtype,
                           kernel_init=trunc_normal_init, name="token_fc")(
            cls_token
        )
        return pooled + cls_out


class HierarchicalDeiT(_DeiTBase):
    """Per-layer TransformerHead logits, 12 outputs (deit_modified.py:62-121)."""

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        cls_token = self.param("cls_token", trunc_normal_init,
                               (1, 1, cfg.embed_dim))
        x = self._embed(x, [cls_token], deterministic)
        norm = self._norm()
        head = self._head()
        outputs = []
        for i in range(cfg.depth):
            x = self._block(i)(x, deterministic=deterministic)
            if i < cfg.depth - 1:
                h = TransformerHead(dtype, name=f"transformerheads_{i}")(
                    norm(x), use_running_average=deterministic
                )
                outputs.append(head(h))
        x = norm(x)
        outputs.append(head(x[:, 0]))
        return tuple(outputs)


class EnsembleDeiT(_DeiTBase):
    """TransformerHeads + 4 quadrant FinalHeads, 16 outputs or their mean
    (deit_ensemble.py:74-115)."""

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, get_average: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        cls_token = self.param("cls_token", trunc_normal_init,
                               (1, 1, cfg.embed_dim))
        x = self._embed(x, [cls_token], deterministic)
        norm = self._norm()
        head = self._head()
        outputs = []
        for i in range(cfg.depth):
            x = self._block(i)(x, deterministic=deterministic)
            if i < cfg.depth - 1:
                h = TransformerHead(dtype, name=f"transformerheads_{i}")(
                    norm(x), use_running_average=deterministic
                )
                outputs.append(head(h))
        x = norm(x)
        patches = x[:, 1:]
        quad = patches.shape[1] // 4
        for idx in range(4):
            seg = patches[:, idx * quad:(idx + 1) * quad]
            pooled = jnp.mean(seg, axis=1)
            h = nn.Dense(cfg.embed_dim, dtype=dtype,
                         kernel_init=trunc_normal_init,
                         name=f"spatialheads_{idx}")(pooled)
            outputs.append(head(h))
        outputs.append(head(x[:, 0]))
        if get_average:
            return jnp.mean(jnp.stack(outputs, 0), axis=0)
        return tuple(outputs)
