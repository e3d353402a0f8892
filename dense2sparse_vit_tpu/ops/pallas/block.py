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

from dense2sparse_vit_tpu.ops.pallas._cost import safe_cost_estimate
from jax.experimental.pallas import tpu as pltpu

from dense2sparse_vit_tpu.ops.pallas.mlp import _gelu_grad
from dense2sparse_vit_tpu.ops.pallas.predictor import _gelu_exact


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _block_kernel(x_ref, pol_ref, sa_ref, sm_ref, wqkv_ref, csq_ref,
                  bqp_ref, wproj_ref, bproj_ref, w1s_ref, cs1_ref, b1p_ref,
                  w2_ref, b2_ref, out_ref, *cls_ref_opt, scale, eps, ln_eps,
                  n_valid, num_heads, head_dim, use_policy, exact=False):
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

    # pad handling is pad-FREE on the non-policy paths: the padded k-rows
    # are zeroed above, so padded columns carry s = 0 exactly and their
    # (statically known) denominator contribution is subtracted after the
    # PV matmul — no (nb, n, n) iota/where built. Only the policy path
    # (eps/N smoothing breaks shift invariance) keeps the explicit mask.
    n_pad = n - n_valid
    if use_policy:
        col = jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 2)
        pad_mask = col < n_valid
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
            # trainable path: exact row-max softmax over ALL columns —
            # padded columns carry s = 0, so this max is max(valid_max, 0),
            # an equally valid stabilizer (softmax is shift-invariant);
            # their e = exp(-m) is removed from the denominator below
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m).astype(v.dtype)
        else:
            # inference fast path: clamp replaces the row-max shift;
            # padded columns carry s = 0 -> e = 1, removed from den below
            e = jnp.exp(jnp.clip(s, -30.0, 30.0)).astype(v.dtype)
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
        elif n_pad:
            # remove the padded columns' contribution: the MXU summed the
            # MODEL-dtype-quantized e values, so subtract exactly those
            # (exp(-m) round-tripped through v.dtype / 1.0 on the clamp
            # path). num needs no correction: padded v-rows are zero.
            if exact:
                den = den - n_pad * jnp.exp(-m).astype(v.dtype).astype(
                    jnp.float32)
            else:
                den = den - float(n_pad)
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
    # per-sample residual-branch scales (stochastic depth / DropPath,
    # dynamic_vit.py:265-266): scale == 1 everywhere is bit-exact identity
    sarow = (
        sa_ref[:].astype(jnp.float32)
        * jnp.ones((nb, n, 1), jnp.float32)
    ).reshape(rows, 1)
    smrow = (
        sm_ref[:].astype(jnp.float32)
        * jnp.ones((nb, n, 1), jnp.float32)
    ).reshape(rows, 1)
    x_mid = (x2.astype(jnp.float32) + sarow * proj).astype(dtype)

    # ---- MLP half (x_mid stays in VMEM) ----
    y = ln_folded_matmul(x_mid, w1s_ref[:], cs1_ref[:], b1p_ref[:])
    act = _gelu_exact(y.astype(dtype))
    o2 = jax.lax.dot_general(
        act, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:].astype(jnp.float32)
    out_ref[:] = (
        x_mid.astype(jnp.float32) + smrow * o2
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
    branch_scales=None,
    interpret: bool = False,
):
    """One whole pre-norm transformer block in one kernel.

    Args:
      x: (B, N, C) residual stream.
      params: dict with ln1_scale/ln1_bias/wqkv/bqkv/wproj/bproj/
        ln2_scale/ln2_bias/w1/b1/w2/b2 (original, unfolded weights).
      branch_scales: optional ((B,), (B,)) per-sample multipliers on the
        attention and MLP residual branches — stochastic depth / DropPath
        (reference dynamic_vit.py:265-266: the Bernoulli(keep)/keep mask
        is per sample). None means 1.0 (bit-exact with the unscaled
        kernel; the multiply by 1.0 is exact in fp32).
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
    if branch_scales is None:
        sa = sm = jnp.ones((B, 1, 1), jnp.float32)
    else:
        sa = branch_scales[0].astype(jnp.float32)[:, None, None]
        sm = branch_scales[1].astype(jnp.float32)[:, None, None]
    operands = [
        xp, pol[:, None, :], sa, sm,
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
        pl.BlockSpec((nb, 1, 1), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, 1, 1), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for op in operands[4:]:
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
        cost_estimate=safe_cost_estimate(
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


def _ref_block(x, params, num_heads, policy, scale, ln_eps,
               branch_scales=None):
    from dense2sparse_vit_tpu.ops.pallas.attention import (
        _ref_attention_block,
    )
    from dense2sparse_vit_tpu.ops.pallas.mlp import _reference_mlp_residual

    x_mid = _ref_attention_block(
        x, params["ln1_scale"], params["ln1_bias"], params["wqkv"],
        params["bqkv"], params["wproj"], params["bproj"], num_heads,
        policy, scale, ln_eps,
    )
    if branch_scales is not None:
        # the half-block refs add the residual internally; recover the
        # branch and apply the per-sample DropPath scale (exact in fp32)
        sa = branch_scales[0].astype(jnp.float32)[:, None, None]
        x_mid = (
            x.astype(jnp.float32) + sa * (
                x_mid.astype(jnp.float32) - x.astype(jnp.float32)
            )
        ).astype(x.dtype)
    out = _reference_mlp_residual(
        x_mid, params["ln2_scale"], params["ln2_bias"], params["w1"],
        params["b1"], params["w2"], params["b2"], ln_eps,
    )
    if branch_scales is not None:
        sm = branch_scales[1].astype(jnp.float32)[:, None, None]
        out = (
            x_mid.astype(jnp.float32) + sm * (
                out.astype(jnp.float32) - x_mid.astype(jnp.float32)
            )
        ).astype(x.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 4, 5))
def fused_transformer_block_trainable(
    x, params, num_heads, policy=None, scale=None, ln_eps=1e-6,
    branch_scales=None,
):
    """Differentiable whole-block: one Pallas kernel in EACH direction
    (the custom VJP runs the single-kernel whole-block backward).

    branch_scales: optional ((B,), (B,)) DropPath multipliers on the two
    residual branches; treated as constants under differentiation (they
    are Bernoulli RNG draws, never functions of parameters), so their
    returned cotangent is zero."""
    return fused_transformer_block(
        x, params, num_heads, policy, scale=scale, ln_eps=ln_eps, exact=True,
        branch_scales=branch_scales,
    )


def _ftb_fwd(x, params, num_heads, policy, scale, ln_eps, branch_scales):
    out = fused_transformer_block(
        x, params, num_heads, policy, scale=scale, ln_eps=ln_eps, exact=True,
        branch_scales=branch_scales,
    )
    return out, (x, params, policy, branch_scales)


def _ftb_bwd(num_heads, scale, ln_eps, res, g):
    x, p, policy, branch_scales = res
    dx, draw, dpol = fused_transformer_block_backward(
        x, g, p, num_heads, policy, scale=scale, ln_eps=ln_eps,
        branch_scales=branch_scales,
    )
    dparams = {key: draw[key].astype(p[key].dtype) for key in p}
    if dpol is not None:
        dpol = dpol.astype(policy.dtype)
    dbs = (
        None if branch_scales is None
        else tuple(jnp.zeros_like(s) for s in branch_scales)
    )
    return dx, dparams, dpol, dbs


fused_transformer_block_trainable.defvjp(_ftb_fwd, _ftb_bwd)


# ---------------------------------------------------------------------------
# Whole-block single-kernel BACKWARD: both halves' backward in one VMEM pass
# ---------------------------------------------------------------------------


def _block_bwd_kernel(x_ref, pol_ref, sa_ref, sm_ref, g_ref, lns1_ref,
                      lnb1_ref, wqkv_ref,
                      bqkv_ref, wproj_ref, bproj_ref, lns2_ref, lnb2_ref,
                      w1_ref, b1_ref, w2_ref,
                      dx_ref, dpol_ref, dlns1_ref, dlnb1_ref, dwqkv_ref,
                      dbqkv_ref, dwproj_ref, dbproj_ref, dlns2_ref,
                      dlnb2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                      scale, eps, ln_eps, n_valid, num_heads, head_dim,
                      use_policy):
    """Recompute-in-VMEM backward of the WHOLE block:
        x_mid = x + proj(attention(qkv(LN1(x))))
        out   = x_mid + fc2(gelu(fc1(LN2(x_mid))))
    x_mid (and every other intermediate) never touches HBM: the attention
    forward is recomputed once (per-head scores s kept in VMEM), the MLP
    half's backward produces dxmid, and the attention backward reuses the
    stored scores. Parameter gradients accumulate across the sequential
    grid (program 0 initializes). Replaces the three-kernel chain
    (attention-half fwd recompute -> MLP-half bwd -> attention-half bwd)
    that round-tripped x_mid and dxmid through HBM.

    Plain mode uses exact row-max softmax (shift invariance makes the
    standard softmax VJP exact); policy mode differentiates
    softmax_with_policy (dynamic_vit.py:195-214) including the max-path
    tie-split and emits dPolicy.
    """
    nb, np_, c = x_ref.shape
    rows = nb * np_
    hd = num_heads * head_dim
    n = np_
    dtype = x_ref.dtype
    ones_c = jnp.ones((c, 8), jnp.float32)
    ones_n = jnp.ones((nb, n, 8), jnp.float32)

    def row_stats(h32):
        mu = jax.lax.dot_general(
            h32, ones_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :1] / c
        d = h32 - mu
        var = jax.lax.dot_general(
            d * d, ones_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:, :1] / c
        rr = jax.lax.rsqrt(var + ln_eps)
        return d * rr, rr

    tok = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % np_
    valid = (tok < n_valid).astype(jnp.float32)
    # non-policy paths are pad-free (see _block_kernel): no (nb, n, n)
    # iota mask; the padded columns' exp(-m) is subtracted from den and
    # the padded dqkv rows are re-zeroed via the cheap per-row `valid`
    n_pad = n - n_valid
    # per-sample DropPath branch scales (1.0 when inactive — exact)
    sarow = (
        sa_ref[:].astype(jnp.float32)
        * jnp.ones((nb, n, 1), jnp.float32)
    ).reshape(rows, 1)
    smrow = (
        sm_ref[:].astype(jnp.float32)
        * jnp.ones((nb, n, 1), jnp.float32)
    ).reshape(rows, 1)

    # ---- forward recompute: LN1 -> qkv (padded rows zeroed) ----
    x2 = x_ref[:].reshape(rows, c)
    x32 = x2.astype(jnp.float32)
    z1, rr1 = row_stats(x32)
    ln1_s = lns1_ref[:].astype(jnp.float32)
    ln1_out = (z1 * ln1_s + lnb1_ref[:].astype(jnp.float32)).astype(dtype)
    wqkv = wqkv_ref[:]
    qkv = ((jax.lax.dot_general(
        ln1_out, wqkv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:].astype(jnp.float32)) * valid).astype(dtype).reshape(
        nb, n, 3 * hd
    )

    if use_policy:
        row3 = jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 1)
        col3 = jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 2)
        pad_mask = col3 < n_valid
        eye = (row3 == col3).astype(jnp.float32)
        off_diag = 1.0 - eye
        pad_f = pad_mask.astype(jnp.float32)
        pol = pol_ref[:]  # (nb, 1, N)
        attn_policy = pol + (1.0 - pol) * eye
        cc = eps / n_valid

    # ---- attention forward (head pass 1): keep s/m/den in VMEM ----
    s_heads, m_heads, den_heads, att_heads = [], [], [], []
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
            s = jnp.where(pad_mask, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        xe = jnp.exp(s - m)
        e = xe * attn_policy if use_policy else xe
        den = jax.lax.dot_general(
            e, ones_n, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, :, :1]
        if use_policy:
            den = den + eps
            p = (e + cc * pad_f) / den
        else:
            # pad-free: padded columns carry s = 0 (zeroed k-rows), so the
            # all-columns max is an equally valid stabilizer and their
            # exp(-m) den contribution is statically removable (fp32 here:
            # e never round-trips through the model dtype in this kernel)
            if n_pad:
                den = den - n_pad * jnp.exp(-m)
            p = e / (den + 1e-30)
        att_heads.append(jax.lax.dot_general(
            p.astype(dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype))
        s_heads.append(s)
        m_heads.append(m)
        den_heads.append(den)

    att_out = jnp.concatenate(att_heads, axis=2).reshape(rows, hd)
    wproj = wproj_ref[:]
    proj = jax.lax.dot_general(
        att_out, wproj, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[:].astype(jnp.float32)
    xmid32 = x32 + sarow * proj
    xmid = xmid32.astype(dtype)

    # ---- MLP half: forward recompute + backward ----
    z2, rr2 = row_stats(xmid32)
    ln2_s = lns2_ref[:].astype(jnp.float32)
    ln2_out = (z2 * ln2_s + lnb2_ref[:].astype(jnp.float32)).astype(dtype)
    w1 = w1_ref[:]
    y = jax.lax.dot_general(
        ln2_out, w1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    act = _gelu_exact(y.astype(dtype))

    g = g_ref[:].reshape(rows, c).astype(jnp.float32)
    # cotangent entering the MLP branch picks up the branch scale; the
    # residual passthrough (the bare `+ g` into dxmid below) does not
    gm2 = g * valid * smrow
    w2 = w2_ref[:]
    da2 = jax.lax.dot_general(
        gm2.astype(dtype), w2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dy = da2 * _gelu_grad(y)
    dln2_out = jax.lax.dot_general(
        dy.astype(dtype), w1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dz2 = dln2_out * ln2_s
    mdz2 = jax.lax.dot_general(
        dz2, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    mdzz2 = jax.lax.dot_general(
        dz2 * z2, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    dxmid = rr2 * (dz2 - mdz2 - z2 * mdzz2) * valid + g

    # ---- attention backward (head pass 2) ----
    gm1 = dxmid * valid * sarow
    datt = jax.lax.dot_general(
        gm1.astype(dtype), wproj, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(nb, n, hd)

    dq_heads, dk_heads, dv_heads = [], [], []
    if use_policy:
        ones_rows3 = jnp.ones((nb, 8, n), jnp.float32)
        dpol_total = jnp.zeros((nb, 8, n), jnp.float32)
    for h in range(num_heads):
        o = h * head_dim
        q = qkv[:, :, o:o + head_dim]
        k = qkv[:, :, hd + o:hd + o + head_dim]
        v = qkv[:, :, 2 * hd + o:2 * hd + o + head_dim]
        gh = datt[:, :, o:o + head_dim]
        s = s_heads[h]
        m = m_heads[h]
        den = den_heads[h]
        xe = jnp.exp(s - m)
        if use_policy:
            e = xe * attn_policy
            p = (e + cc * pad_f) / den
        else:
            e = xe
            p = e / (den + 1e-30)
        dv_heads.append(jax.lax.dot_general(
            p.astype(dtype), gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        dp = jax.lax.dot_general(
            gh, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        r = jax.lax.dot_general(
            dp * p, ones_n, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, :, :1]
        if use_policy:
            de = (dp - r) / den
            ds_dir = de * e
            gmx = -jax.lax.dot_general(
                ds_dir, ones_n, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, :, :1]
            tie = jnp.where((s == m) & pad_mask, 1.0, 0.0)
            cnt = jax.lax.dot_general(
                tie, ones_n, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, :, :1]
            ds = ((ds_dir + gmx * tie / cnt) * scale).astype(dtype)
            dpol_total = dpol_total + jax.lax.dot_general(
                ones_rows3, de * xe * off_diag, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        else:
            ds = (p * (dp - r) * scale).astype(dtype)
        dq_heads.append(jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        dk_heads.append(jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
    if use_policy:
        dpol_ref[:] = dpol_total[:, :1].astype(dpol_ref.dtype)
    else:
        dpol_ref[:] = jnp.zeros_like(dpol_ref)

    # re-zero padded token rows: pad-free softmax leaves p/ds nonzero in
    # padded COLUMNS, which lands in dk/dv's padded ROWS — without this
    # mask those rows would contaminate dwqkv/dbqkv through ln1_out's
    # (nonzero) padded rows. One (rows, 1) multiply vs the (nb, n, n)
    # masks removed above.
    dqkv = (jnp.concatenate(
        dq_heads + dk_heads + dv_heads, axis=2
    ).reshape(rows, 3 * hd) * valid).astype(dtype)

    dln1_out = jax.lax.dot_general(
        dqkv, wqkv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dz1 = dln1_out * ln1_s
    mdz1 = jax.lax.dot_general(
        dz1, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    mdzz1 = jax.lax.dot_general(
        dz1 * z1, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    dx = rr1 * (dz1 - mdz1 - z1 * mdzz1) * valid + dxmid
    dx_ref[:] = dx.reshape(nb, np_, c).astype(dx_ref.dtype)

    # ---- parameter gradients, accumulated across the sequential grid ----
    ones_rows = jnp.ones((8, rows), jnp.float32)

    def colsum(a32):
        return jax.lax.dot_general(
            ones_rows, a32, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:1]

    dym = dy * valid
    grads = {
        "dwproj": jax.lax.dot_general(
            att_out, gm1.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
        "dbproj": colsum(gm1),
        "dwqkv": jax.lax.dot_general(
            ln1_out, dqkv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
        "dbqkv": colsum(dqkv.astype(jnp.float32)),
        "dlns1": colsum(dln1_out * z1),
        "dlnb1": colsum(dln1_out),
        "dw2": jax.lax.dot_general(
            act, gm2.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
        "db2": colsum(gm2),
        "dw1": jax.lax.dot_general(
            ln2_out, dym.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
        "db1": colsum(dym),
        "dlns2": colsum(dln2_out * z2 * valid),
        "dlnb2": colsum(dln2_out * valid),
    }
    refs = {
        "dlns1": dlns1_ref, "dlnb1": dlnb1_ref, "dwqkv": dwqkv_ref,
        "dbqkv": dbqkv_ref, "dwproj": dwproj_ref, "dbproj": dbproj_ref,
        "dlns2": dlns2_ref, "dlnb2": dlnb2_ref, "dw1": dw1_ref,
        "db1": db1_ref, "dw2": dw2_ref, "db2": db2_ref,
    }

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for key, ref in refs.items():
            ref[:] = grads[key].astype(ref.dtype)

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        for key, ref in refs.items():
            ref[:] += grads[key].astype(ref.dtype)


def fused_transformer_block_backward(
    x: jnp.ndarray,
    g: jnp.ndarray,
    params: dict,
    num_heads: int,
    policy: jnp.ndarray | None = None,
    *,
    scale: float | None = None,
    eps: float = 1e-6,
    ln_eps: float = 1e-6,
    block_batch: int | None = None,
    branch_scales=None,
    interpret: bool = False,
):
    """All cotangents of the whole transformer block in ONE kernel.

    Returns (dx, dparams, dpolicy) where dparams matches the
    fused_transformer_block params dict (fp32 grads) and dpolicy is None
    in plain mode. block_batch None auto-selects per N (the single-kernel
    backward keeps per-head scores AND the MLP intermediates live in VMEM
    simultaneously, so the optimum shrinks as N grows — see the measured
    table in BENCHMARKS.md).
    """
    B, N, C = x.shape
    head_dim = C // num_heads
    if scale is None:
        scale = head_dim ** -0.5
    dtype = x.dtype
    Np = _round_up(N, 16)
    pad = Np - N
    use_policy = policy is not None
    pol = (policy.astype(jnp.float32) if use_policy
           else jnp.ones((B, N), jnp.float32))
    if pad:
        x = jnp.pad(x, [(0, 0), (0, pad), (0, 0)])
        g = jnp.pad(g, [(0, 0), (0, pad), (0, 0)])
        pol = jnp.pad(pol, [(0, 0), (0, pad)])
    if block_batch is None:
        # measured on v5e (B=128, DeiT-S widths): nb=2 wins for N >= ~128
        # (VMEM pressure from per-head scores dominates), nb=4 below it
        # (grid-dispatch amortization dominates); nb=8 exceeds the VMEM
        # limit at N=208
        block_batch = 2 if Np >= 128 else 4
    nb = block_batch
    while B % nb:
        nb //= 2
    nb = max(nb, 1)
    hidden = params["w1"].shape[1]

    if branch_scales is None:
        sa = sm = jnp.ones((B, 1, 1), jnp.float32)
    else:
        sa = branch_scales[0].astype(jnp.float32)[:, None, None]
        sm = branch_scales[1].astype(jnp.float32)[:, None, None]
    operands = [
        x, pol[:, None, :], sa, sm, g.astype(dtype),
        params["ln1_scale"].astype(jnp.float32)[None, :],
        params["ln1_bias"].astype(jnp.float32)[None, :],
        params["wqkv"].astype(dtype),
        params["bqkv"].astype(jnp.float32)[None, :],
        params["wproj"].astype(dtype),
        params["bproj"].astype(jnp.float32)[None, :],
        params["ln2_scale"].astype(jnp.float32)[None, :],
        params["ln2_bias"].astype(jnp.float32)[None, :],
        params["w1"].astype(dtype),
        params["b1"].astype(jnp.float32)[None, :],
        params["w2"].astype(dtype),
    ]
    in_specs = [
        pl.BlockSpec((nb, Np, C), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, 1, Np), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, 1, 1), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, 1, 1), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, Np, C), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for op in operands[5:]:
        in_specs.append(
            pl.BlockSpec(op.shape, lambda b, nd=op.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )

    def cspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out_specs = (
        pl.BlockSpec((nb, Np, C), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, 1, Np), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        cspec((1, C)), cspec((1, C)),
        cspec((C, 3 * C)), cspec((1, 3 * C)),
        cspec((C, C)), cspec((1, C)),
        cspec((1, C)), cspec((1, C)),
        cspec((C, hidden)), cspec((1, hidden)),
        cspec((hidden, C)), cspec((1, C)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, Np, C), dtype),
        jax.ShapeDtypeStruct((B, 1, Np), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
        jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
        jax.ShapeDtypeStruct((C, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((C, hidden), jnp.float32),
        jax.ShapeDtypeStruct((1, hidden), jnp.float32),
        jax.ShapeDtypeStruct((hidden, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
    )
    (dx, dpol, dlns1, dlnb1, dwqkv, dbqkv, dwproj, dbproj, dlns2, dlnb2,
     dw1, db1, dw2, db2) = pl.pallas_call(
        functools.partial(
            _block_bwd_kernel,
            scale=scale, eps=eps, ln_eps=ln_eps, n_valid=N,
            num_heads=num_heads, head_dim=head_dim, use_policy=use_policy,
        ),
        grid=(B // nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=safe_cost_estimate(
            flops=8 * 2 * B * num_heads * Np * Np * head_dim
            + 2 * B * Np * C * (6 * C + 6 * hidden),
            bytes_accessed=4 * B * Np * C * jnp.dtype(dtype).itemsize,
            transcendentals=2 * B * num_heads * Np * Np
            + 2 * B * Np * hidden,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    if pad:
        dx = dx[:, :N]
    dparams = {
        "ln1_scale": dlns1[0], "ln1_bias": dlnb1[0],
        "wqkv": dwqkv, "bqkv": dbqkv[0],
        "wproj": dwproj, "bproj": dbproj[0],
        "ln2_scale": dlns2[0], "ln2_bias": dlnb2[0],
        "w1": dw1, "b1": db1[0], "w2": dw2, "b2": db2[0],
    }
    dpolicy = dpol[:, 0, :N] if use_policy else None
    return dx, dparams, dpolicy
