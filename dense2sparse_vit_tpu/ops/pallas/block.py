"""Whole transformer block as ONE Pallas kernel (Pallas, TPU).

Composes the two half-block kernels (ops/pallas/attention.py::
fused_attention_block, ops/pallas/mlp.py::fused_mlp_residual) into a single
program so the post-attention residual stream never leaves VMEM between the
halves — per block, HBM sees exactly one read of x and one write of the
block output. Used on the deterministic path (eval / teacher capture);
training keeps the two half kernels, whose custom VJPs run the fused
backward kernels with the stored intermediate.

Math per program (all in VMEM, LN folded into the adjacent projections):
    x_mid = x + proj(attention(qkv(LN1(x))))      [+ optional CLS capture]
    out   = x_mid + fc2(gelu(fc1(LN2(x_mid))))
Differentiable via custom VJP that recomputes x_mid with the attention
half kernel and chains the two fused backward kernels.

Parity: reference Block (dynamic_vit.py:240-283).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dense2sparse_vit_tpu.ops.pallas.predictor import _gelu_exact


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _block_kernel(x_ref, pol_ref, wqkv_ref, csq_ref, bqp_ref, wproj_ref,
                  bproj_ref, w1s_ref, cs1_ref, b1p_ref, w2_ref, b2_ref,
                  out_ref, *cls_ref_opt, scale, eps, ln_eps, n_valid,
                  num_heads, head_dim, use_policy, exact=False):
    cls_ref = cls_ref_opt[0] if cls_ref_opt else None
    nb, np_, c = x_ref.shape
    rows = nb * np_
    hd = num_heads * head_dim
    n = np_
    dtype = x_ref.dtype
    ones_c = jnp.ones((c, 8), jnp.float32)

    def ln_folded_matmul(h, w_s, cs, bp):
        """LN(h) @ (scale (x) W) + folded bias, h in model dtype -> fp32."""
        h32 = h.astype(jnp.float32)
        mu = jax.lax.dot_general(
            h32, ones_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :1] / c
        q = jax.lax.dot_general(
            h32 * h32, ones_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :1]
        var = q / c - mu * mu
        rr = jax.lax.rsqrt(var + ln_eps)
        t = jax.lax.dot_general(
            h, w_s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return rr * t - (rr * mu) * cs.astype(jnp.float32) \
            + bp.astype(jnp.float32)

    # ---- attention half ----
    x2 = x_ref[:].reshape(rows, c)
    # zero padded qkv rows (LN of a zero row is ln_bias, so the folded
    # bias makes them nonzero) — keeps the policy eps/N colsum_v term
    # free of O(eps*pad) contamination, matching the packed kernel
    rowtok = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % n
    row_valid = (rowtok < n_valid).astype(jnp.float32)
    qkv = (ln_folded_matmul(
        x2, wqkv_ref[:], csq_ref[:], bqp_ref[:]
    ) * row_valid).astype(dtype).reshape(nb, n, 3 * hd)

    col = jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 2)
    pad_mask = col < n_valid
    if use_policy:
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 1) == col
        ).astype(jnp.float32)
        attn_policy = pol_ref[:] + (1.0 - pol_ref[:]) * eye

    head_outs = []
    for h in range(num_heads):
        o = h * head_dim
        q = qkv[:, :, o:o + head_dim]
        k = qkv[:, :, hd + o:hd + o + head_dim]
        v = qkv[:, :, 2 * hd + o:2 * hd + o + head_dim]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if use_policy:
            m = jnp.max(
                jnp.where(pad_mask, s, -jnp.inf), axis=-1, keepdims=True
            )
            e = (jnp.exp(s - m) * attn_policy).astype(v.dtype)
        elif exact:
            # trainable path: exact row-max softmax (see _attn_kernel)
            s = jnp.where(pad_mask, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m).astype(v.dtype)
        else:
            s = jnp.where(pad_mask, jnp.clip(s, -30.0, 30.0), -jnp.inf)
            e = jnp.exp(s).astype(v.dtype)
        ones_cols = max(8, 128 - head_dim % 128) if head_dim % 128 else 8
        v_ext = jnp.concatenate(
            [v, jnp.ones((nb, n, ones_cols), v.dtype)], axis=2
        )
        o_ext = jax.lax.dot_general(
            e, v_ext, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        num = o_ext[:, :, :head_dim]
        den = o_ext[:, :, head_dim:head_dim + 8][:, :, :1]
        if use_policy:
            colsum_v = jax.lax.dot_general(
                jnp.ones((nb, 8, n), v.dtype), v,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, :1]
            num = num + (eps / n_valid) * colsum_v
            den = den + eps
        head_outs.append((num / den).astype(dtype))
        if cls_ref is not None:
            e_cls = e[:, 0:1, :].astype(jnp.float32)
            if use_policy:
                p_cls = (e_cls + eps / n_valid) / den[:, 0:1]
            else:
                p_cls = e_cls / den[:, 0:1]
            cls_ref[:, h:h + 1, :] = p_cls.astype(cls_ref.dtype)

    attn_out = jnp.concatenate(head_outs, axis=2).reshape(rows, hd)
    proj = jax.lax.dot_general(
        attn_out, wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[:].astype(jnp.float32)
    x_mid = (x2.astype(jnp.float32) + proj).astype(dtype)

    # ---- MLP half (x_mid stays in VMEM) ----
    y = ln_folded_matmul(x_mid, w1s_ref[:], cs1_ref[:], b1p_ref[:])
    act = _gelu_exact(y.astype(dtype))
    o2 = jax.lax.dot_general(
        act, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:].astype(jnp.float32)
    out_ref[:] = (
        x_mid.astype(jnp.float32) + o2
    ).reshape(nb, np_, c).astype(out_ref.dtype)


def _fold_ln(scale, bias, w, b, dtype):
    """(scale (x) W) in model dtype, its fp32 column sums, bias@W + b."""
    w_s = (scale.astype(jnp.float32)[:, None]
           * w.astype(jnp.float32)).astype(dtype)
    cs = jnp.sum(w_s.astype(jnp.float32), axis=0, keepdims=True)
    bp = (bias.astype(jnp.float32) @ w.astype(jnp.float32)
          + b.astype(jnp.float32))[None, :]
    return w_s, cs, bp


def fused_transformer_block(
    x: jnp.ndarray,
    params: dict,
    num_heads: int,
    policy: jnp.ndarray | None = None,
    *,
    scale: float | None = None,
    eps: float = 1e-6,
    ln_eps: float = 1e-6,
    block_batch: int = 8,
    return_cls: bool = False,
    exact: bool = False,
    interpret: bool = False,
):
    """One whole pre-norm transformer block in one kernel.

    Args:
      x: (B, N, C) residual stream.
      params: dict with ln1_scale/ln1_bias/wqkv/bqkv/wproj/bproj/
        ln2_scale/ln2_bias/w1/b1/w2/b2 (original, unfolded weights).
    """
    B, N, C = x.shape
    head_dim = C // num_heads
    if scale is None:
        scale = head_dim ** -0.5
    dtype = x.dtype
    Np = _round_up(N, 16)
    pad = Np - N
    xp = jnp.pad(x, [(0, 0), (0, pad), (0, 0)]) if pad else x
    use_policy = policy is not None
    if use_policy:
        pol = policy.astype(jnp.float32)
        if pad:
            pol = jnp.pad(pol, [(0, 0), (0, pad)])
    else:
        pol = jnp.ones((B, Np), jnp.float32)
    nb = block_batch
    while B % nb:
        nb //= 2
    nb = max(nb, 1)

    wqkv_s, csq, bqp = _fold_ln(
        params["ln1_scale"], params["ln1_bias"],
        params["wqkv"], params["bqkv"], dtype,
    )
    w1s, cs1, b1p = _fold_ln(
        params["ln2_scale"], params["ln2_bias"],
        params["w1"], params["b1"], dtype,
    )
    operands = [
        xp, pol[:, None, :],
        wqkv_s, csq, bqp,
        params["wproj"].astype(dtype),
        params["bproj"].astype(jnp.float32)[None, :],
        w1s, cs1, b1p,
        params["w2"].astype(dtype),
        params["b2"].astype(jnp.float32)[None, :],
    ]
    in_specs = [
        pl.BlockSpec((nb, Np, C), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, 1, Np), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for op in operands[2:]:
        in_specs.append(
            pl.BlockSpec(op.shape, lambda b, nd=op.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )
    out_specs = pl.BlockSpec((nb, Np, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, Np, C), dtype)
    if return_cls:
        out_specs = (
            out_specs,
            pl.BlockSpec((nb, num_heads, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B, num_heads, Np), dtype))
    hidden = params["w1"].shape[1]
    result = pl.pallas_call(
        functools.partial(
            _block_kernel,
            scale=scale, eps=eps, ln_eps=ln_eps, n_valid=N,
            num_heads=num_heads, head_dim=head_dim, use_policy=use_policy,
            exact=exact,
        ),
        grid=(B // nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * C * (4 * C + 2 * hidden)
            + 2 * 2 * B * num_heads * Np * Np * head_dim,
            bytes_accessed=2 * B * Np * C * jnp.dtype(dtype).itemsize,
            transcendentals=B * Np * (num_heads * Np + hidden),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    if return_cls:
        out, cls_attn = result
        return (out[:, :N] if pad else out,
                cls_attn[:, :, :N] if pad else cls_attn)
    return result[:, :N] if pad else result


def _ref_block(x, params, num_heads, policy, scale, ln_eps):
    from dense2sparse_vit_tpu.ops.pallas.attention import (
        _ref_attention_block,
    )
    from dense2sparse_vit_tpu.ops.pallas.mlp import _reference_mlp_residual

    x_mid = _ref_attention_block(
        x, params["ln1_scale"], params["ln1_bias"], params["wqkv"],
        params["bqkv"], params["wproj"], params["bproj"], num_heads,
        policy, scale, ln_eps,
    )
    return _reference_mlp_residual(
        x_mid, params["ln2_scale"], params["ln2_bias"], params["w1"],
        params["b1"], params["w2"], params["b2"], ln_eps,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 4, 5))
def fused_transformer_block_trainable(
    x, params, num_heads, policy=None, scale=None, ln_eps=1e-6,
):
    """Differentiable whole-block: one Pallas kernel forward; backward
    recomputes x_mid with the attention half kernel and chains the two
    fused half-block backward kernels."""
    return fused_transformer_block(
        x, params, num_heads, policy, scale=scale, ln_eps=ln_eps, exact=True,
    )


def _ftb_fwd(x, params, num_heads, policy, scale, ln_eps):
    out = fused_transformer_block(
        x, params, num_heads, policy, scale=scale, ln_eps=ln_eps, exact=True,
    )
    return out, (x, params, policy)


def _ftb_bwd(num_heads, scale, ln_eps, res, g):
    from dense2sparse_vit_tpu.ops.pallas.attention import (
        fused_attention_block,
        fused_attention_block_backward,
        fused_attention_block_backward_policy,
    )
    from dense2sparse_vit_tpu.ops.pallas.mlp import (
        fused_mlp_residual_backward,
    )

    x, p, policy = res
    x_mid = fused_attention_block(
        x, p["ln1_scale"], p["ln1_bias"], p["wqkv"], p["bqkv"],
        p["wproj"], p["bproj"], num_heads, policy,
        scale=scale, ln_eps=ln_eps, exact=True,
    )
    dxmid, dlns2, dlnb2, dw1, db1, dw2, db2 = fused_mlp_residual_backward(
        x_mid, g, p["ln2_scale"], p["ln2_bias"], p["w1"], p["b1"], p["w2"],
        eps=ln_eps,
    )
    if policy is None:
        dx, dlns1, dlnb1, dwqkv, dbqkv, dwproj, dbproj = (
            fused_attention_block_backward(
                x, dxmid, p["ln1_scale"], p["ln1_bias"], p["wqkv"],
                p["bqkv"], p["wproj"], num_heads,
                scale=scale, ln_eps=ln_eps,
            )
        )
        dpol = None
    else:
        (dx, dpol, dlns1, dlnb1, dwqkv, dbqkv, dwproj, dbproj) = (
            fused_attention_block_backward_policy(
                x, dxmid, policy, p["ln1_scale"], p["ln1_bias"],
                p["wqkv"], p["bqkv"], p["wproj"], num_heads,
                scale=scale, ln_eps=ln_eps,
            )
        )
        dpol = dpol.astype(policy.dtype)
    dparams = {
        "ln1_scale": dlns1.astype(p["ln1_scale"].dtype),
        "ln1_bias": dlnb1.astype(p["ln1_bias"].dtype),
        "wqkv": dwqkv.astype(p["wqkv"].dtype),
        "bqkv": dbqkv.astype(p["bqkv"].dtype),
        "wproj": dwproj.astype(p["wproj"].dtype),
        "bproj": dbproj.astype(p["bproj"].dtype),
        "ln2_scale": dlns2.astype(p["ln2_scale"].dtype),
        "ln2_bias": dlnb2.astype(p["ln2_bias"].dtype),
        "w1": dw1.astype(p["w1"].dtype),
        "b1": db1.astype(p["b1"].dtype),
        "w2": dw2.astype(p["w2"].dtype),
        "b2": db2.astype(p["b2"].dtype),
    }
    return dx, dparams, dpol


fused_transformer_block_trainable.defvjp(_ftb_fwd, _ftb_bwd)
