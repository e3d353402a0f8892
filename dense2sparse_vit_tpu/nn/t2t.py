"""Tokens-to-Token (T2T) stem components.

Parity:
  - Token_transformer (/root/reference/vit_models/token_transformer.py):
    T2T attention projecting dim -> in_dim with V as the skip connection
    (:26-43), wrapped in a pre-norm block with a ratio-1 MLP (:45-60).
  - Token_performer (/root/reference/vit_models/token_performer.py):
    FAVOR+ linear attention with positive random features
    exp(w^T x - |x|^2/2)/sqrt(m) (:31-43), kernelized attention einsums with
    V skip (:45-54), frozen orthogonal projection (:28-29).
  - get_sinusoid_encoding (/root/reference/vit_models/transformer_block.py:78-88).
  - soft-split: torch nn.Unfold -> lax.conv_general_dilated_patches (XLA
    lowers patch extraction to a convolution, MXU-friendly), channel-major
    patch ordering matching torch.

TPU notes: the first T2T stage runs attention over 3136 tokens — with the
single-head token_transformer that is a (3136, 3136) attention map, which is
exactly why the reference defaults to the performer (linear attention) stem;
both are supported here.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dense2sparse_vit_tpu.nn.layers import Mlp, trunc_normal_init

Dtype = Any


def get_sinusoid_encoding(n_position: int, d_hid: int) -> np.ndarray:
    """(1, n_position, d_hid) fixed sinusoid table (transformer_block.py:78-88)."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None]


def unfold(x: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    """torch.nn.Unfold equivalent on NHWC input.

    Returns (B, L, C*k*k) tokens in channel-major patch order (c, kh, kw),
    matching torch's Unfold flattening, so converted checkpoints line up.
    """
    B, H, W, C = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(kernel, kernel),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H', W', C*k*k), feature dim ordered channel-major
    Bp, Hp, Wp, F = patches.shape
    return patches.reshape(Bp, Hp * Wp, F)


class TokenTransformer(nn.Module):
    """T2T transformer unit: attention dim->in_dim with V-skip + MLP."""

    in_dim: int
    num_heads: int = 1
    mlp_ratio: float = 1.0
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, N, C = x.shape
        head_dim = C // self.num_heads
        scale = head_dim ** -0.5

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(
            self.in_dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
            kernel_init=trunc_normal_init, name="qkv",
        )(y)
        qkv = qkv.reshape(B, N, 3, self.num_heads, self.in_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        # NOTE: reference scales by (dim/num_heads)^-0.5 even though q/k are
        # in_dim wide (token_transformer.py:18-19); replicated for parity
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.num_heads * self.in_dim)
        out = nn.Dense(
            self.in_dim, dtype=self.dtype, kernel_init=trunc_normal_init,
            name="proj",
        )(out)
        # V as skip connection — input/output widths differ
        # (token_transformer.py:41-42); heads==1 so squeeze matches
        x = v.transpose(0, 2, 1, 3).reshape(B, N, -1) + out
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(
            hidden_features=int(self.in_dim * self.mlp_ratio),
            out_features=self.in_dim,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic=deterministic)
        return x


class TokenPerformer(nn.Module):
    """FAVOR+ linear-attention T2T unit (token_performer.py)."""

    in_dim: int
    kernel_ratio: float = 0.5
    dp1: float = 0.1
    dp2: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        emb = self.in_dim
        m = int(emb * self.kernel_ratio)
        # frozen orthogonal random projection, scaled by sqrt(m)
        # (token_performer.py:28-29); named 'prm_w' so the optimizer's
        # frozen-group rule catches it
        w = self.param(
            "prm_w",
            lambda key, shape: jax.random.orthogonal(key, max(shape))[
                : shape[0], : shape[1]
            ] * np.sqrt(shape[0]),
            (m, emb),
        )
        w = jax.lax.stop_gradient(w)

        def prm_exp(t):
            # exp(w^T t - |t|^2/2) / sqrt(m) (token_performer.py:31-43)
            t = t.astype(jnp.float32)
            td = jnp.sum(t * t, axis=-1, keepdims=True) / 2
            wtx = jnp.einsum("bti,mi->btm", t, w.astype(jnp.float32))
            return jnp.exp(wtx - td) / np.sqrt(m)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        kqv = nn.Dense(
            3 * emb, dtype=self.dtype, kernel_init=trunc_normal_init,
            name="kqv",
        )(y)
        k, q, v = jnp.split(kqv, 3, axis=-1)  # reference order: k, q, v
        kp, qp = prm_exp(k), prm_exp(q)
        D = jnp.einsum("bti,bi->bt", qp, jnp.sum(kp, axis=1))[..., None]
        kptv = jnp.einsum("bin,bim->bnm", v.astype(jnp.float32), kp)
        y = jnp.einsum("bti,bni->btn", qp, kptv) / (D + 1e-8)
        y = y.astype(self.dtype)
        y = nn.Dense(
            emb, dtype=self.dtype, kernel_init=trunc_normal_init, name="proj"
        )(y)
        y = nn.Dropout(self.dp1)(y, deterministic=deterministic)
        x = v + y  # V skip (token_performer.py:55)
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        z = nn.Dense(
            emb, dtype=self.dtype, kernel_init=trunc_normal_init, name="mlp_fc1"
        )(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(
            emb, dtype=self.dtype, kernel_init=trunc_normal_init, name="mlp_fc2"
        )(z)
        z = nn.Dropout(self.dp2)(z, deterministic=deterministic)
        return x + z


class T2TModule(nn.Module):
    """Tokens-to-token stem: 3 soft splits + 2 T2T units + projection
    (t2t_vit.py:45-104). tokens_type in {'performer', 'transformer',
    'convolution'}."""

    embed_dim: int = 768
    tokens_type: str = "performer"
    token_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        td = self.token_dim
        if self.tokens_type == "convolution":
            # plain 3-conv stem (t2t_vit.py:74-79)
            for i, (c, k, s, p) in enumerate(
                [(td, 7, 4, 2), (td, 3, 2, 1), (self.embed_dim, 3, 2, 1)]
            ):
                x = nn.Conv(
                    c, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                    dtype=self.dtype, name=f"conv_{i}",
                )(x.astype(self.dtype))
            B, H, W, C = x.shape
            return x.reshape(B, H * W, C)

        unit = TokenTransformer if self.tokens_type == "transformer" else TokenPerformer

        x = unfold(x.astype(self.dtype), 7, 4, 2)  # (B, 3136, C*49)
        if self.tokens_type == "transformer":
            x = unit(in_dim=td, num_heads=1, mlp_ratio=1.0, dtype=self.dtype,
                     name="attention1")(x, deterministic=deterministic)
        else:
            x = unit(in_dim=td, dtype=self.dtype, name="attention1")(
                x, deterministic=deterministic
            )
        B, L, C = x.shape
        g = int(np.sqrt(L))
        x = unfold(x.reshape(B, g, g, C), 3, 2, 1)  # (B, 784, td*9)
        if self.tokens_type == "transformer":
            x = unit(in_dim=td, num_heads=1, mlp_ratio=1.0, dtype=self.dtype,
                     name="attention2")(x, deterministic=deterministic)
        else:
            x = unit(in_dim=td, dtype=self.dtype, name="attention2")(
                x, deterministic=deterministic
            )
        B, L, C = x.shape
        g = int(np.sqrt(L))
        x = unfold(x.reshape(B, g, g, C), 3, 2, 1)  # (B, 196, td*9)
        return nn.Dense(
            self.embed_dim, dtype=self.dtype, kernel_init=trunc_normal_init,
            name="project",
        )(x)
