"""Fused multi-head attention kernel (Pallas, TPU).

Why: on TPU the unfused attention path (transpose to (B, H, N, d), QK^T,
fp32 softmax with the (B, H, N, N) probabilities materialized in HBM, PV,
transpose back) is HBM-bandwidth-bound: measured on a v5e it accounts for
~75% of a ViT-S forward at N=197 even though it holds <10% of the FLOPs.

Design:
  * operates directly on the PACKED qkv projection output (B, N, 3*H*d) —
    the natural layout produced by the qkv Dense — and writes (B, N, H*d),
    the natural layout consumed by the output projection. The four explicit
    (B,N,H,d)<->(B,H,N,d) transposes of the unfused path disappear.
  * grid is (B / nb,): each program holds nb batch rows of packed qkv in
    VMEM and loops over (nb, H) head problems with python-unrolled dots, so
    per-program work is large enough to hide grid and DMA overhead (a
    (B, H)-gridded variant measured 1.5x SLOWER than XLA for this reason).
  * scores/softmax stay in fp32 in VMEM and are never written to HBM.

Masking modes:
  * plain: padded tail tokens (N padded to a 16 multiple) are excluded via
    additive -inf masking.
  * policy: the reference's `softmax_with_policy` semantics
    (/root/reference/vit_models/dynamic_vit.py:195-214) — dropped-token
    columns zeroed except the diagonal, eps/N smoothing — used by
    threshold-mode pruning; padding folds into the policy as zeros.

Differentiability: every entry point is a custom-VJP wrapper with a FUSED
backward kernel — `fused_attention_backward_packed` (plain AND policy
modes, dqkv + dpolicy + CLS-row cotangent folding) for the packed
kernels, and `fused_attention_block_backward` for the whole half-block
(recompute-in-VMEM, accumulated parameter gradients). CLS-attention
capture (what the teacher and the student's visualization path need per
block) is a second kernel output costing no extra matmuls
(`return_cls=True`).

Round 2 adds the fully fused HALF-BLOCK (`fused_attention_block`):
x + proj(attention(qkv(LN1(x)))) in one kernel, LN1 folded into the qkv
projection so the (B, N, 3C) qkv tensor never exists in HBM; with the MLP
kernel (ops/pallas/mlp.py) each plain-mode transformer block is exactly
two Pallas kernels in BOTH directions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from dense2sparse_vit_tpu.ops.pallas._cost import safe_cost_estimate
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(qkv_ref, policy_ref, out_ref, *cls_ref_opt, scale, eps,
                 n_valid, num_heads, head_dim, use_policy, exact=False):
    """nb batch rows: qkv_ref (nb, N, 3*H*d), policy_ref (nb, 1, N),
    out_ref (nb, N, H*d); optional cls_ref (nb, H, N) receives the CLS
    (row 0) attention probabilities per head.

    Per head, all nb samples run as ONE batched dot_general (batch dim =
    the block's batch rows). Mosaic lowers batched dots now (round 1's
    per-head-per-sample loop predates that); measured 3-9% faster at every
    stage width with bit-identical output."""
    cls_ref = cls_ref_opt[0] if cls_ref_opt else None
    nb, n, _ = qkv_ref.shape
    hd = num_heads * head_dim

    # non-policy paths are pad-FREE: padded k-rows are zero (the wrapper
    # zero-pads qkv), so padded columns carry s = 0 exactly and their
    # statically-known denominator contribution is subtracted after the
    # PV matmul instead of building an (nb, n, n) iota/where mask. Only
    # the policy path (eps/N smoothing breaks shift invariance) masks.
    n_pad = n - n_valid
    if use_policy:
        col = jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 2)
        pad_mask = col < n_valid  # (nb, n, n)
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 1) == col
        ).astype(jnp.float32)
        pol = policy_ref[:]  # (nb, 1, N)
        attn_policy = pol + (1.0 - pol) * eye  # (nb, n, n)

    qkv = qkv_ref[:]
    for h in range(num_heads):
        o = h * head_dim
        q = qkv[:, :, o:o + head_dim]
        k = qkv[:, :, hd + o:hd + o + head_dim]
        v = qkv[:, :, 2 * hd + o:2 * hd + o + head_dim]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (nb, n, n) fp32
        if use_policy:
            # softmax_with_policy (dynamic_vit.py:198-213), faithful:
            # row-max subtraction, eps/N smoothing. The max runs over
            # VALID columns only: the eps terms break shift invariance,
            # so including padded columns would perturb the result
            # whenever a row's true max is negative.
            m = jnp.max(
                jnp.where(pad_mask, s, -jnp.inf), axis=-1, keepdims=True
            )
            e = (jnp.exp(s - m) * attn_policy).astype(v.dtype)
        elif exact:
            # trainable path: row-max subtraction over ALL columns —
            # padded columns carry s = 0, so this max is max(valid_max, 0),
            # an equally valid stabilizer (softmax is shift-invariant; the
            # standard softmax VJP in the backward kernels stays exact);
            # their e = exp(-m) is removed from the denominator below
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m).astype(v.dtype)
        else:
            # inference fast path: cross-lane row reductions are the VPU
            # bottleneck here, so (1) replace the row-max shift with a
            # range clamp (exact softmax whenever |logit| <= 30, which
            # holds for trained ViTs; prevents fp32 overflow otherwise)
            # and (2) fold the row-sum into the PV matmul below via an
            # appended ones column. Padded columns carry s = 0 -> e = 1,
            # removed from the denominator below.
            e = jnp.exp(jnp.clip(s, -30.0, 30.0)).astype(v.dtype)
        # PV and the softmax denominator in ONE matmul: E @ [V | 1];
        # pad the ones block so head_dim + ones_cols fills a 128-lane
        # MXU tile exactly (no extra tile => the rowsum is free)
        ones_cols = max(8, 128 - head_dim % 128) if head_dim % 128 else 8
        v_ext = jnp.concatenate(
            [v, jnp.ones((nb, n, ones_cols), v.dtype)], axis=2
        )
        o_ext = jax.lax.dot_general(
            e, v_ext,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (nb, n, d + 128): [E@V | rowsum broadcast]
        num = o_ext[:, :, :head_dim]
        den = o_ext[:, :, head_dim:head_dim + 8][:, :, :1]
        if use_policy:
            # p = (e + eps/N) / (den + eps): the eps/N numerator term
            # contributes (eps/N) * colsum(V) to each output row
            colsum_v = jax.lax.dot_general(
                jnp.ones((nb, 8, n), v.dtype), v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, :1]  # (nb, 1, d)
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
        out_ref[:, :, o:o + head_dim] = (num / den).astype(out_ref.dtype)
        if cls_ref is not None:
            # CLS attention row: p[0, :] = (e[0, :] (+ eps/N)) / den[0]
            e_cls = e[:, 0:1, :].astype(jnp.float32)  # (nb, 1, n)
            if use_policy:
                p_cls = (e_cls + eps / n_valid) / den[:, 0:1]
            else:
                p_cls = e_cls / den[:, 0:1]
            cls_ref[:, h:h + 1, :] = p_cls.astype(cls_ref.dtype)


def fused_attention_packed(
    qkv: jnp.ndarray,
    num_heads: int,
    policy: jnp.ndarray | None = None,
    *,
    scale: float | None = None,
    eps: float = 1e-6,
    block_batch: int = 8,
    return_cls: bool = False,
    exact: bool = False,
    interpret: bool = False,
):
    """Fused attention on the packed qkv projection output.

    Args:
      qkv: (B, N, 3*H*d) — concatenated [q | k | v] along the channel dim,
        exactly the output of the qkv Dense layer.
      num_heads: H.
      policy: optional (B, N) keep mask (see module docstring).
      scale: default (d)^-0.5.
      block_batch: batch rows per kernel program.
      return_cls: also return the (B, H, N) CLS-row attention probabilities
        (token 0's attention over all tokens) — what the teacher captures at
        every block for the mask loss (dynamic_vit.py:216-236) — at no extra
        matmul cost.

    Returns:
      (B, N, H*d) attention output, or (output, cls_attn) with return_cls.
    """
    B, N, three_hd = qkv.shape
    hd = three_hd // 3
    head_dim = hd // num_heads
    if scale is None:
        scale = head_dim ** -0.5

    Np = _round_up(N, 16)
    pad = Np - N
    if pad:
        qkv = jnp.pad(qkv, [(0, 0), (0, pad), (0, 0)])
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

    kernel = functools.partial(
        _attn_kernel,
        scale=scale,
        eps=eps,
        n_valid=N,
        num_heads=num_heads,
        head_dim=head_dim,
        use_policy=use_policy,
        exact=exact,
    )
    out_specs = pl.BlockSpec((nb, Np, hd), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, Np, hd), qkv.dtype)
    if return_cls:
        out_specs = (
            out_specs,
            pl.BlockSpec((nb, num_heads, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((B, num_heads, Np), qkv.dtype),
        )
    result = pl.pallas_call(
        kernel,
        grid=(B // nb,),
        in_specs=[
            pl.BlockSpec((nb, Np, three_hd), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=safe_cost_estimate(
            flops=2 * 2 * B * num_heads * Np * Np * head_dim,
            bytes_accessed=4 * B * Np * hd * qkv.dtype.itemsize,
            transcendentals=B * num_heads * Np * Np,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkv, pol[:, None, :])
    if return_cls:
        out, cls_attn = result
        if pad:
            out = out[:, :N]
            cls_attn = cls_attn[:, :, :N]
        return out, cls_attn
    out = result
    if pad:
        out = out[:, :N]
    return out


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(1, 3)
)
def fused_attention_packed_trainable(qkv, num_heads, policy=None, scale=None):
    """Differentiable fused attention: Pallas forward AND Pallas backward.

    The forward runs the fused kernel with exact row-max softmax (the
    inference clamp fast path is numerically wrong past |logit| > 30, so
    the trainable path never uses it); the backward dispatches to the fused
    backward kernels (`fused_attention_backward_packed`) which recompute P
    in VMEM and run the five attention-backward dots per head — plain and
    policy (softmax_with_policy, incl. dPolicy) modes. No (B, H, N, N)
    tensor ever touches HBM in either direction.

    num_heads and scale are static (nondiff) arguments.
    """
    return fused_attention_packed(qkv, num_heads, policy, scale=scale,
                                  exact=True)


def _ref_attention_packed(qkv, num_heads, policy, scale):
    """jnp reference of the packed fused attention (for the backward)."""
    from dense2sparse_vit_tpu.ops.masked_softmax import softmax_with_policy

    B, N, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // num_heads
    if scale is None:
        scale = d ** -0.5
    x = qkv.reshape(B, N, 3, num_heads, d)
    q, k, v = (x[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    s = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if policy is None:
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    else:
        p = softmax_with_policy(s, policy)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(qkv.dtype), v)
    return o.transpose(0, 2, 1, 3).reshape(B, N, hd)


def _fat_fwd(qkv, num_heads, policy, scale):
    out = fused_attention_packed(qkv, num_heads, policy, scale=scale,
                                 exact=True)
    return out, (qkv, policy)


def _fat_bwd(num_heads, scale, res, g):
    qkv, policy = res
    if policy is None:
        # fully fused backward kernel (P recomputed in VMEM, five dots, no
        # (B, H, N, N) HBM traffic)
        return (
            fused_attention_backward_packed(qkv, g, num_heads, scale=scale),
            None,
        )
    # policy mode (threshold pruning / gumbel masking): fused policy backward
    dqkv, dpol = fused_attention_backward_packed(
        qkv, g, num_heads, policy=policy, scale=scale
    )
    return dqkv, dpol.astype(policy.dtype)


fused_attention_packed_trainable.defvjp(_fat_fwd, _fat_bwd)


def _attn_bwd_kernel(qkv_ref, g_ref, *refs, scale, n_valid, num_heads,
                     head_dim, has_cls):
    """Fused attention backward, plain-softmax mode.

    Per head, batched over the block's batch rows: recompute P from qkv
    (cheaper than storing the (N, N) probabilities in HBM between passes),
    then
        dV = P^T g,   dP = g V^T,
        dS = P * (dP - rowsum(dP * P))   [softmax backward],
        dQ = scale * dS K,   dK = scale * dS^T Q.
    The rowsum is folded into a matmul against an ones block (same trick as
    the forward). All five dots stay in VMEM.
    qkv_ref/g_ref blocks: (nb, N, 3*H*d) / (nb, N, H*d); dqkv out matches qkv.
    With has_cls, a (nb, H, N) cotangent for the CLS-row probabilities
    (second forward output) folds into dP's row 0 before the softmax
    backward.
    """
    if has_cls:
        gcls_ref, dqkv_ref = refs
    else:
        (dqkv_ref,) = refs
    nb, n, _ = qkv_ref.shape
    hd = num_heads * head_dim

    col = jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 2)
    pad_mask = col < n_valid
    if has_cls:
        row_is_cls = jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 1) == 0

    qkv = qkv_ref[:]
    gout = g_ref[:]  # (nb, N, H*d)
    ones_n = jnp.ones((nb, n, 8), jnp.float32)
    for h in range(num_heads):
        o = h * head_dim
        q = qkv[:, :, o:o + head_dim]
        k = qkv[:, :, hd + o:hd + o + head_dim]
        v = qkv[:, :, 2 * hd + o:2 * hd + o + head_dim]
        g = gout[:, :, o:o + head_dim]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        # exact row-max recompute (matches the trainable forward's exact
        # softmax; shift invariance makes the VJP below exact regardless)
        s = jnp.where(pad_mask, s, -jnp.inf)
        e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
        # rowsum via ones-matmul (lane reductions are the VPU bottleneck)
        den = jax.lax.dot_general(
            e, ones_n, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, :, :1]
        # +tiny: padded rows have e == 0 everywhere; without it p = 0/0
        # NaNs would poison dV through the P^T g contraction
        p = (e / (den + 1e-30)).astype(v.dtype)  # (nb, n, n)
        # dV = P^T g
        dv = jax.lax.dot_general(
            p, g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dP = g V^T
        dp = jax.lax.dot_general(
            g, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if has_cls:
            # CLS-probability cotangent lands on P's row 0
            gc = gcls_ref[:, h:h + 1, :].astype(jnp.float32)  # (nb, 1, n)
            dp = jnp.where(row_is_cls, dp + gc, dp)
        # softmax backward; rowsum(dP * P) via ones-matmul
        dpp = dp * p.astype(jnp.float32)
        r = jax.lax.dot_general(
            dpp, ones_n, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, :, :1]
        ds = (p.astype(jnp.float32) * (dp - r) * scale).astype(v.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, o:o + head_dim] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, hd + o:hd + o + head_dim] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * hd + o:2 * hd + o + head_dim] = dv.astype(
            dqkv_ref.dtype
        )


def _attn_bwd_policy_kernel(qkv_ref, pol_ref, g_ref, *refs, scale, eps,
                            n_valid, num_heads, head_dim, has_cls):
    """Fused attention backward, policy (softmax_with_policy) mode.

    Differentiates the exact reference formula (dynamic_vit.py:195-214)
        A    = pol + (1 - pol) * I
        x    = exp(s - max_valid(s));  e = x * A
        den  = rowsum(e) + eps;        p = (e + eps/N) / den
        out  = p v;  cls = p[0]
    entirely in VMEM:
        dV   = p^T g
        dP   = g v^T (+ g_cls folded into row 0)
        dE   = (dP - rowsum(dP * p)) / den
        dS   = dE * e  +  max-path term (JAX tie-split semantics: the O(eps)
               non-shift-invariance of the eps terms routes -rowsum(dE * e)
               to the argmax columns)
        dQ   = scale * dS k;  dK = scale * dS^T q
        dPol = colsum(dE * x * (1 - I))  summed over heads  (the diagonal of
               A is policy-independent: d(pol + (1-pol)I)/dpol has zero diag)
    dpol is what makes gumbel-policy training differentiable end-to-end
    through the fused kernel (previously a jax.vjp fallback re-materialized
    (B, H, N, N) in HBM for exactly these modes).
    """
    if has_cls:
        gcls_ref, dqkv_ref, dpol_ref = refs
    else:
        dqkv_ref, dpol_ref = refs
    nb, n, _ = qkv_ref.shape
    hd = num_heads * head_dim

    row = jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 2)
    pad_mask = col < n_valid
    eye = (row == col).astype(jnp.float32)
    off_diag = 1.0 - eye
    if has_cls:
        row_is_cls = row == 0
    c = eps / n_valid

    qkv = qkv_ref[:]
    gout = g_ref[:]  # (nb, N, H*d)
    pol = pol_ref[:]  # (nb, 1, N)
    attn_policy = pol + (1.0 - pol) * eye  # (nb, n, n)
    ones_n = jnp.ones((nb, n, 8), jnp.float32)
    ones_rows = jnp.ones((nb, 8, n), jnp.float32)
    dpol_total = jnp.zeros((nb, 8, n), jnp.float32)
    for h in range(num_heads):
        o = h * head_dim
        q = qkv[:, :, o:o + head_dim]
        k = qkv[:, :, hd + o:hd + o + head_dim]
        v = qkv[:, :, 2 * hd + o:2 * hd + o + head_dim]
        g = gout[:, :, o:o + head_dim]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(
            jnp.where(pad_mask, s, -jnp.inf), axis=-1, keepdims=True
        )
        x = jnp.exp(s - m)
        e = x * attn_policy
        den = jax.lax.dot_general(
            e, ones_n, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, :, :1] + eps
        p = (e + c) / den  # (nb, n, n) fp32
        # dV = P^T g (P cast to the value dtype, as the forward's PV dot)
        dv = jax.lax.dot_general(
            p.astype(v.dtype), g, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dP = g V^T
        dp = jax.lax.dot_general(
            g, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if has_cls:
            gc = gcls_ref[:, h:h + 1, :].astype(jnp.float32)  # (nb, 1, n)
            dp = jnp.where(row_is_cls, dp + gc, dp)
        r = jax.lax.dot_general(
            dp * p, ones_n, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, :, :1]
        de = (dp - r) / den
        ds_dir = de * e
        # max path: gradient through m = max(s) — JAX splits it equally
        # among tied argmax columns
        gm = -jax.lax.dot_general(
            ds_dir, ones_n, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, :, :1]
        tie = jnp.where((s == m) & pad_mask, 1.0, 0.0)
        cnt = jax.lax.dot_general(
            tie, ones_n, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, :, :1]
        ds = ((ds_dir + gm * tie / cnt) * scale).astype(v.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, o:o + head_dim] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, hd + o:hd + o + head_dim] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * hd + o:2 * hd + o + head_dim] = dv.astype(
            dqkv_ref.dtype
        )
        # dPol: colsum of the off-diagonal dA = dE * x
        dpol_total = dpol_total + jax.lax.dot_general(
            ones_rows, de * x * off_diag, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    dpol_ref[:] = dpol_total[:, :1].astype(dpol_ref.dtype)


def fused_attention_backward_packed(
    qkv: jnp.ndarray,
    g: jnp.ndarray,
    num_heads: int,
    *,
    policy: jnp.ndarray | None = None,
    gcls: jnp.ndarray | None = None,
    scale: float | None = None,
    eps: float = 1e-6,
    block_batch: int = 8,
    interpret: bool = False,
):
    """dL/d(qkv) (and dL/d(policy)) for the fused attention, as one kernel.

    Args:
      qkv: (B, N, 3*H*d) forward input (P is recomputed from it).
      g: (B, N, H*d) cotangent of the attention output.
      policy: optional (B, N) keep mask — selects the softmax_with_policy
        backward and adds a dpolicy output.
      gcls: optional (B, H, N) cotangent of the CLS-row probabilities
        (the return_cls second forward output).

    Returns (B, N, 3*H*d) gradient in the packed layout, or a
    (dqkv, dpolicy) pair when `policy` is given.
    """
    B, N, three_hd = qkv.shape
    hd = three_hd // 3
    head_dim = hd // num_heads
    if scale is None:
        scale = head_dim ** -0.5
    Np = _round_up(N, 16)
    pad = Np - N
    if pad:
        qkv = jnp.pad(qkv, [(0, 0), (0, pad), (0, 0)])
        g = jnp.pad(g, [(0, 0), (0, pad), (0, 0)])
        if gcls is not None:
            gcls = jnp.pad(gcls, [(0, 0), (0, 0), (0, pad)])
    nb = block_batch
    while B % nb:
        nb //= 2
    nb = max(nb, 1)
    has_cls = gcls is not None
    use_policy = policy is not None

    qkv_spec = pl.BlockSpec((nb, Np, three_hd), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((nb, Np, hd), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    gcls_spec = pl.BlockSpec((nb, num_heads, Np), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    dqkv_shape = jax.ShapeDtypeStruct((B, Np, three_hd), qkv.dtype)

    if use_policy:
        pol = policy.astype(jnp.float32)
        if pad:
            pol = jnp.pad(pol, [(0, 0), (0, pad)])
        kernel = functools.partial(
            _attn_bwd_policy_kernel,
            scale=scale,
            eps=eps,
            n_valid=N,
            num_heads=num_heads,
            head_dim=head_dim,
            has_cls=has_cls,
        )
        pol_spec = pl.BlockSpec((nb, 1, Np), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        operands = [qkv, pol[:, None, :], g]
        in_specs = [qkv_spec, pol_spec, g_spec]
        if has_cls:
            operands.append(gcls)
            in_specs.append(gcls_spec)
        dqkv, dpol = pl.pallas_call(
            kernel,
            grid=(B // nb,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((nb, Np, three_hd), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 1, Np), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                dqkv_shape,
                jax.ShapeDtypeStruct((B, 1, Np), jnp.float32),
            ),
            cost_estimate=safe_cost_estimate(
                flops=6 * 2 * B * num_heads * Np * Np * head_dim,
                bytes_accessed=8 * B * Np * hd * qkv.dtype.itemsize,
                transcendentals=B * num_heads * Np * Np,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*operands)
        dpol = dpol[:, 0, :N] if pad else dpol[:, 0, :]
        if pad:
            dqkv = dqkv[:, :N]
        return dqkv, dpol

    kernel = functools.partial(
        _attn_bwd_kernel,
        scale=scale,
        n_valid=N,
        num_heads=num_heads,
        head_dim=head_dim,
        has_cls=has_cls,
    )
    operands = [qkv, g]
    in_specs = [qkv_spec, g_spec]
    if has_cls:
        operands.append(gcls)
        in_specs.append(gcls_spec)
    out = pl.pallas_call(
        kernel,
        grid=(B // nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb, Np, three_hd), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=dqkv_shape,
        cost_estimate=safe_cost_estimate(
            flops=5 * 2 * B * num_heads * Np * Np * head_dim,
            bytes_accessed=8 * B * Np * hd * qkv.dtype.itemsize,
            transcendentals=B * num_heads * Np * Np,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    if pad:
        out = out[:, :N]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3))
def fused_attention_packed_with_cls_trainable(
    qkv, num_heads, policy=None, scale=None
):
    """Like fused_attention_packed_trainable but also returns the (B, H, N)
    CLS-row attention probabilities (second output)."""
    return fused_attention_packed(
        qkv, num_heads, policy, scale=scale, return_cls=True, exact=True
    )


def _ref_attention_packed_with_cls(qkv, num_heads, policy, scale):
    from dense2sparse_vit_tpu.ops.masked_softmax import softmax_with_policy

    B, N, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // num_heads
    if scale is None:
        scale = d ** -0.5
    x = qkv.reshape(B, N, 3, num_heads, d)
    q, k, v = (x[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    s = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if policy is None:
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    else:
        p = softmax_with_policy(s, policy)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(qkv.dtype), v)
    return (
        o.transpose(0, 2, 1, 3).reshape(B, N, hd),
        p[:, :, 0, :].astype(qkv.dtype),
    )


def _fatc_fwd(qkv, num_heads, policy, scale):
    out = fused_attention_packed(
        qkv, num_heads, policy, scale=scale, return_cls=True, exact=True
    )
    return out, (qkv, policy)


def _fatc_bwd(num_heads, scale, res, g):
    qkv, policy = res
    g_out, g_cls = g
    if policy is None:
        return (
            fused_attention_backward_packed(
                qkv, g_out, num_heads, gcls=g_cls, scale=scale
            ),
            None,
        )
    dqkv, dpol = fused_attention_backward_packed(
        qkv, g_out, num_heads, policy=policy, gcls=g_cls, scale=scale
    )
    return dqkv, dpol.astype(policy.dtype)


fused_attention_packed_with_cls_trainable.defvjp(_fatc_fwd, _fatc_bwd)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    policy: jnp.ndarray | None = None,
    *,
    scale: float | None = None,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """Head-major convenience wrapper: (B, H, N, d) in and out.

    Prefer `fused_attention_packed` on the hot path — it avoids the layout
    transposes entirely.
    """
    B, H, N, d = q.shape
    # (B, H, N, d) -> (B, N, H*d) x3 -> packed
    def tok_major(x):
        return x.transpose(0, 2, 1, 3).reshape(B, N, H * d)

    qkv = jnp.concatenate([tok_major(q), tok_major(k), tok_major(v)], axis=-1)
    out = fused_attention_packed(
        qkv, H, policy, scale=scale, eps=eps, interpret=interpret
    )
    return out.reshape(B, N, H, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Fully fused attention half-block: x + proj(attention(qkv(LN1(x))))
# ---------------------------------------------------------------------------


def _attn_block_kernel(x_ref, pol_ref, wqkv_ref, cs_ref, b1p_ref, wproj_ref,
                       bproj_ref, out_ref, *cls_ref_opt, scale, eps, ln_eps,
                       n_valid, num_heads, head_dim, use_policy, exact=False,
                       two_phase=False):
    """The whole pre-norm attention half-block in one VMEM pass.

    LN1 is folded into the qkv projection (scale into the kernel,
    bias@W + b into one row, mu correction via the kernel's column sums —
    same algebra as ops/pallas/mlp.py), so the (B, N, 3C) qkv tensor and
    the LN output never exist in HBM; the attention core is the batched
    per-head loop of `_attn_kernel`; the output projection and the residual
    add happen before the single HBM write.
    """
    cls_ref = cls_ref_opt[0] if cls_ref_opt else None
    nb, np_, c = x_ref.shape
    rows = nb * np_
    hd = num_heads * head_dim
    n = np_

    x2 = x_ref[:].reshape(rows, c)
    x32 = x2.astype(jnp.float32)
    ones_c = jnp.ones((c, 8), jnp.float32)
    sm = jax.lax.dot_general(
        x32, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1]
    qm = jax.lax.dot_general(
        x32 * x32, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1]
    mu = sm / c
    var = qm / c - mu * mu
    rr = jax.lax.rsqrt(var + ln_eps)
    t = jax.lax.dot_general(
        x2, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, 3C) fp32
    # zero padded qkv rows: LN of a zero row is ln_bias, so b1p makes them
    # nonzero — the policy eps/N colsum_v term below would otherwise pick
    # up O(eps*pad) contamination absent from the packed kernel / jnp ref
    rowtok = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % n
    row_valid = (rowtok < n_valid).astype(jnp.float32)
    qkv = (
        (rr * t - (rr * mu) * cs_ref[:].astype(jnp.float32)
         + b1p_ref[:].astype(jnp.float32)) * row_valid
    ).astype(x2.dtype).reshape(nb, n, 3 * hd)

    n_pad = n - n_valid
    if use_policy or exact:
        col = jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 2)
        pad_mask = col < n_valid
    if use_policy:
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 1) == col
        ).astype(jnp.float32)
        pol = pol_ref[:]  # (nb, 1, N)
        attn_policy = pol + (1.0 - pol) * eye

    def _slices(h):
        o = h * head_dim
        return (qkv[:, :, o:o + head_dim],
                qkv[:, :, hd + o:hd + o + head_dim],
                qkv[:, :, 2 * hd + o:2 * hd + o + head_dim])

    def _scores(q, k):
        return jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale

    def _exp(s, v_dtype):
        if use_policy:
            m = jnp.max(
                jnp.where(pad_mask, s, -jnp.inf), axis=-1, keepdims=True
            )
            return (jnp.exp(s - m) * attn_policy).astype(v_dtype)
        if exact:
            # trainable path: exact row-max softmax (see _attn_kernel)
            s = jnp.where(pad_mask, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            return jnp.exp(s - m).astype(v_dtype)
        # inference fast path, pad-free (measured +11% at N=208,
        # scripts/attn_variants.py v1): padded k-rows are zeroed above, so
        # their scores are exactly 0 and exp(0)=1 — the static pad count is
        # subtracted from the denominator in _av below instead of building
        # an (nb, N, N) iota mask and where()-ing every score. Exact same
        # algebra as the masked form.
        return jnp.exp(jnp.clip(s, -30.0, 30.0)).astype(v_dtype)

    def _av(e, v, h):
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
        elif not exact and n_pad:
            den = den - float(n_pad)  # exp(0)=1 per padded column
        if cls_ref is not None:
            e_cls = e[:, 0:1, :].astype(jnp.float32)
            if use_policy:
                p_cls = (e_cls + eps / n_valid) / den[:, 0:1]
            else:
                p_cls = e_cls / den[:, 0:1]
            cls_ref[:, h:h + 1, :] = p_cls.astype(cls_ref.dtype)
        return (num / den).astype(x2.dtype)

    if two_phase and not (use_policy or exact):
        # small-N schedule (measured +7-17% at Np <= 112,
        # scripts/attn_variants.py v3): emit ALL QK^T dots, then all exp
        # chains, then all AV dots — maximally independent MXU/VPU chains
        # for Mosaic to overlap. At large N the staged fp32 score buffers
        # add VMEM pressure and this loses; the host wrapper gates it on N.
        ss = [_scores(*_slices(h)[:2]) for h in range(num_heads)]
        es = [_exp(s, x2.dtype) for s in ss]
        head_outs = [
            _av(es[h], _slices(h)[2], h) for h in range(num_heads)
        ]
    else:
        head_outs = []
        for h in range(num_heads):
            q, k, v = _slices(h)
            e = _exp(_scores(q, k), v.dtype)
            head_outs.append(_av(e, v, h))

    attn_out = jnp.concatenate(head_outs, axis=2).reshape(rows, hd)
    proj = jax.lax.dot_general(
        attn_out, wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[:].astype(jnp.float32)
    out_ref[:] = (x32 + proj).reshape(nb, np_, c).astype(out_ref.dtype)


def fused_attention_block(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
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
    """x + proj(attention(qkv(LN1(x)))) in one kernel. x: (B, N, C)."""
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

    wqkv_s = (ln_scale.astype(jnp.float32)[:, None]
              * wqkv.astype(jnp.float32)).astype(dtype)
    cs = jnp.sum(wqkv_s.astype(jnp.float32), axis=0, keepdims=True)
    b1p = (ln_bias.astype(jnp.float32) @ wqkv.astype(jnp.float32)
           + bqkv.astype(jnp.float32))[None, :]
    operands = [xp, pol[:, None, :], wqkv_s, cs, b1p,
                wproj.astype(dtype), bproj.astype(jnp.float32)[None, :]]
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

    kernel = functools.partial(
        _attn_block_kernel,
        scale=scale,
        eps=eps,
        ln_eps=ln_eps,
        n_valid=N,
        num_heads=num_heads,
        head_dim=head_dim,
        use_policy=use_policy,
        exact=exact,
        # two-phase MXU/VPU schedule pays off only where the staged fp32
        # score buffers fit comfortably in VMEM (measured crossover between
        # Np=144 and Np=112, scripts/attn_variants.py)
        two_phase=Np <= 112,
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
    result = pl.pallas_call(
        kernel,
        grid=(B // nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=safe_cost_estimate(
            flops=2 * B * Np * C * (3 * C + C)
            + 2 * 2 * B * num_heads * Np * Np * head_dim,
            bytes_accessed=2 * B * Np * C * jnp.dtype(dtype).itemsize,
            transcendentals=B * num_heads * Np * Np,
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


def _ref_attention_block(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                         num_heads, policy, scale, ln_eps):
    """jnp reference of the fused half-block (for the custom backward)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
    h = ((x32 - mu) * jax.lax.rsqrt(var + ln_eps)
         * ln_scale.astype(jnp.float32)
         + ln_bias.astype(jnp.float32)).astype(x.dtype)
    qkv = h @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)
    attn = _ref_attention_packed(qkv, num_heads, policy, scale)
    return x + (attn @ wproj.astype(x.dtype) + bproj.astype(x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 9, 10))
def fused_attention_block_trainable(
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_heads,
    policy=None, scale=None, ln_eps=1e-6,
):
    """Differentiable half-block: Pallas forward (exact row-max softmax)
    and fused Pallas backward kernels (`fused_attention_block_backward` /
    `..._backward_policy` — recompute-in-VMEM, accumulated parameter
    grads, dPolicy in policy mode)."""
    return fused_attention_block(
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_heads, policy,
        scale=scale, ln_eps=ln_eps, exact=True,
    )


def _fab_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_heads,
             policy, scale, ln_eps):
    out = fused_attention_block(
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_heads, policy,
        scale=scale, ln_eps=ln_eps, exact=True,
    )
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, policy)


def _fab_bwd(num_heads, scale, ln_eps, res, g):
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, policy = res
    if policy is None:
        dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj = (
            fused_attention_block_backward(
                x, g, ln_scale, ln_bias, wqkv, bqkv, wproj, num_heads,
                scale=scale, ln_eps=ln_eps,
            )
        )
        return (
            dx,
            dlns.astype(ln_scale.dtype), dlnb.astype(ln_bias.dtype),
            dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
            dwproj.astype(wproj.dtype),
            # dbproj: out = ... + bproj broadcast over every (B, N) slot
            dbproj.astype(bproj.dtype),
            None,
        )
    dx, dpol, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj = (
        fused_attention_block_backward_policy(
            x, g, policy, ln_scale, ln_bias, wqkv, bqkv, wproj, num_heads,
            scale=scale, ln_eps=ln_eps,
        )
    )
    return (
        dx,
        dlns.astype(ln_scale.dtype), dlnb.astype(ln_bias.dtype),
        dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
        dwproj.astype(wproj.dtype), dbproj.astype(bproj.dtype),
        dpol.astype(policy.dtype),
    )


fused_attention_block_trainable.defvjp(_fab_fwd, _fab_bwd)


def _attn_block_bwd_kernel(x_ref, g_ref, lns_ref, lnb_ref, wqkv_ref,
                           bqkv_ref, wproj_ref, dx_ref, dlns_ref, dlnb_ref,
                           dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, *,
                           scale, ln_eps, n_valid, num_heads, head_dim):
    """Recompute-in-VMEM backward of x + proj(attention(qkv(LN1(x)))).

    Plain-softmax mode (the flagship top-k training path). Per program:
    recompute LN1 / qkv / per-head attention probabilities for its nb rows,
    run the five attention backward dots per head, then the projection /
    LN1 backward, emitting dx and ACCUMULATING the six parameter gradients
    into constant-index outputs (sequential grid: program 0 initializes).
    Padded rows produce exactly-zero dqkv (their g rows are masked and
    their probability rows are zero), so weight reductions need no extra
    masking beyond the g mask.
    """
    nb, np_, c = x_ref.shape
    rows = nb * np_
    hd = num_heads * head_dim
    n = np_
    dtype = x_ref.dtype

    # ---- forward recompute: LN1 -> qkv ----
    x2 = x_ref[:].reshape(rows, c)
    x32 = x2.astype(jnp.float32)
    ones_c = jnp.ones((c, 8), jnp.float32)
    mu = jax.lax.dot_general(
        x32, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    d0 = x32 - mu
    var = jax.lax.dot_general(
        d0 * d0, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    rr = jax.lax.rsqrt(var + ln_eps)
    z = d0 * rr
    ln_s = lns_ref[:].astype(jnp.float32)
    ln_out = (z * ln_s + lnb_ref[:].astype(jnp.float32)).astype(dtype)
    wqkv = wqkv_ref[:]
    qkv = (jax.lax.dot_general(
        ln_out, wqkv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:].astype(jnp.float32)).astype(dtype).reshape(nb, n, 3 * hd)

    # ---- masked upstream cotangent ----
    tok = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % np_
    valid = (tok < n_valid).astype(jnp.float32)
    g = g_ref[:].reshape(rows, c).astype(jnp.float32)
    gm = g * valid
    wproj = wproj_ref[:]
    datt = jax.lax.dot_general(
        gm.astype(dtype), wproj, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(nb, n, hd)  # dout @ Wproj^T

    col = jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 2)
    pad_mask = col < n_valid
    ones_n = jnp.ones((nb, n, 8), jnp.float32)
    att_heads, dq_heads, dk_heads, dv_heads = [], [], [], []
    for h in range(num_heads):
        o = h * head_dim
        q = qkv[:, :, o:o + head_dim]
        k = qkv[:, :, hd + o:hd + o + head_dim]
        v = qkv[:, :, 2 * hd + o:2 * hd + o + head_dim]
        gh = datt[:, :, o:o + head_dim]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        # exact row-max recompute (matches the trainable forward's exact
        # softmax; shift invariance makes the VJP below exact regardless)
        s = jnp.where(pad_mask, s, -jnp.inf)
        e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
        den = jax.lax.dot_general(
            e, ones_n, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, :, :1]
        p = (e / (den + 1e-30)).astype(dtype)
        att_heads.append(jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype))
        dv_heads.append(jax.lax.dot_general(
            p, gh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        dp = jax.lax.dot_general(
            gh, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dpp = dp * p.astype(jnp.float32)
        r = jax.lax.dot_general(
            dpp, ones_n, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, :, :1]
        ds = (p.astype(jnp.float32) * (dp - r) * scale).astype(dtype)
        dq_heads.append(jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        dk_heads.append(jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))

    att_out = jnp.concatenate(att_heads, axis=2).reshape(rows, hd)
    dqkv = jnp.concatenate(
        dq_heads + dk_heads + dv_heads, axis=2
    ).reshape(rows, 3 * hd).astype(dtype)

    # ---- projection / qkv / LN1 backward ----
    dln_out = jax.lax.dot_general(
        dqkv, wqkv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dz = dln_out * ln_s
    mdz = jax.lax.dot_general(
        dz, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    mdzz = jax.lax.dot_general(
        dz * z, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    dx = rr * (dz - mdz - z * mdzz) * valid + g
    dx_ref[:] = dx.reshape(nb, np_, c).astype(dx_ref.dtype)

    ones_rows = jnp.ones((8, rows), jnp.float32)

    def colsum(a32):
        return jax.lax.dot_general(
            ones_rows, a32, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:1]

    dwproj_c = jax.lax.dot_general(
        att_out, gm.astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbproj_c = colsum(gm)
    dwqkv_c = jax.lax.dot_general(
        ln_out, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbqkv_c = colsum(dqkv.astype(jnp.float32))
    dlns_c = colsum(dln_out * z)
    dlnb_c = colsum(dln_out)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[:] = dwqkv_c.astype(dwqkv_ref.dtype)
        dbqkv_ref[:] = dbqkv_c.astype(dbqkv_ref.dtype)
        dwproj_ref[:] = dwproj_c.astype(dwproj_ref.dtype)
        dbproj_ref[:] = dbproj_c.astype(dbproj_ref.dtype)
        dlns_ref[:] = dlns_c.astype(dlns_ref.dtype)
        dlnb_ref[:] = dlnb_c.astype(dlnb_ref.dtype)

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dwqkv_ref[:] += dwqkv_c.astype(dwqkv_ref.dtype)
        dbqkv_ref[:] += dbqkv_c.astype(dbqkv_ref.dtype)
        dwproj_ref[:] += dwproj_c.astype(dwproj_ref.dtype)
        dbproj_ref[:] += dbproj_c.astype(dbproj_ref.dtype)
        dlns_ref[:] += dlns_c.astype(dlns_ref.dtype)
        dlnb_ref[:] += dlnb_c.astype(dlnb_ref.dtype)


def fused_attention_block_backward(
    x: jnp.ndarray,
    g: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wproj: jnp.ndarray,
    num_heads: int,
    *,
    scale: float | None = None,
    ln_eps: float = 1e-6,
    block_batch: int = 8,
    interpret: bool = False,
):
    """All cotangents of the plain-mode attention half-block in one kernel.

    Returns (dx, dln_scale, dln_bias, dwqkv, dbqkv, dwproj, dbproj) —
    weight grads fp32, dx in x.dtype.
    """
    B, N, C = x.shape
    head_dim = C // num_heads
    if scale is None:
        scale = head_dim ** -0.5
    dtype = x.dtype
    Np = _round_up(N, 16)
    if Np != N:
        x = jnp.pad(x, [(0, 0), (0, Np - N), (0, 0)])
        g = jnp.pad(g, [(0, 0), (0, Np - N), (0, 0)])
    nb = block_batch
    while B % nb:
        nb //= 2
    nb = max(nb, 1)

    operands = [
        x, g.astype(dtype),
        ln_scale.astype(jnp.float32)[None, :],
        ln_bias.astype(jnp.float32)[None, :],
        wqkv.astype(dtype),
        bqkv.astype(jnp.float32)[None, :],
        wproj.astype(dtype),
    ]
    in_specs = [
        pl.BlockSpec((nb, Np, C), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, Np, C), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for op in operands[2:]:
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
        cspec((1, C)), cspec((1, C)),
        cspec((C, 3 * C)), cspec((1, 3 * C)),
        cspec((C, C)), cspec((1, C)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, Np, C), dtype),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
        jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
        jax.ShapeDtypeStruct((C, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
    )
    dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj = pl.pallas_call(
        functools.partial(
            _attn_block_bwd_kernel,
            scale=scale, ln_eps=ln_eps, n_valid=N,
            num_heads=num_heads, head_dim=head_dim,
        ),
        grid=(B // nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=safe_cost_estimate(
            flops=6 * 2 * B * num_heads * Np * Np * head_dim
            + 6 * 2 * B * Np * C * 3 * C,
            bytes_accessed=4 * B * Np * C * jnp.dtype(dtype).itemsize,
            transcendentals=B * num_heads * Np * Np,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    if Np != N:
        dx = dx[:, :N]
    return (dx, dlns[0], dlnb[0], dwqkv, dbqkv[0], dwproj, dbproj[0])


def _attn_block_bwd_policy_kernel(
        x_ref, pol_ref, g_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
        wproj_ref, dx_ref, dpol_ref, dlns_ref, dlnb_ref, dwqkv_ref,
        dbqkv_ref, dwproj_ref, dbproj_ref, *, scale, eps, ln_eps, n_valid,
        num_heads, head_dim):
    """Policy-mode (softmax_with_policy) backward of the attention
    half-block, including dPolicy — the gradient channel gumbel-policy
    training flows through. Same recompute-in-VMEM structure as the plain
    kernel; the attention core follows `_attn_bwd_policy_kernel` (valid-max
    tie-split, eps/N smoothing, off-diagonal dPolicy colsum over heads)."""
    nb, np_, c = x_ref.shape
    rows = nb * np_
    hd = num_heads * head_dim
    n = np_
    dtype = x_ref.dtype

    # ---- forward recompute: LN1 -> qkv ----
    x2 = x_ref[:].reshape(rows, c)
    x32 = x2.astype(jnp.float32)
    ones_c = jnp.ones((c, 8), jnp.float32)
    mu = jax.lax.dot_general(
        x32, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    d0 = x32 - mu
    var = jax.lax.dot_general(
        d0 * d0, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    rr = jax.lax.rsqrt(var + ln_eps)
    z = d0 * rr
    ln_s = lns_ref[:].astype(jnp.float32)
    ln_out = (z * ln_s + lnb_ref[:].astype(jnp.float32)).astype(dtype)
    wqkv = wqkv_ref[:]
    tok = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % np_
    valid = (tok < n_valid).astype(jnp.float32)
    # zero padded qkv rows (matches the forward kernel): without this the
    # eps/N term would leak padded-V mass into valid rows' p and the
    # weight-grad reductions
    qkv = ((jax.lax.dot_general(
        ln_out, wqkv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:].astype(jnp.float32)) * valid).astype(dtype).reshape(
        nb, n, 3 * hd
    )

    g = g_ref[:].reshape(rows, c).astype(jnp.float32)
    gm = g * valid
    wproj = wproj_ref[:]
    datt = jax.lax.dot_general(
        gm.astype(dtype), wproj, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(nb, n, hd)

    row3 = jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 1)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 2)
    pad_mask = col3 < n_valid
    pad_f = pad_mask.astype(jnp.float32)
    eye = (row3 == col3).astype(jnp.float32)
    off_diag = 1.0 - eye
    pol = pol_ref[:]  # (nb, 1, N)
    attn_policy = pol + (1.0 - pol) * eye
    cc = eps / n_valid
    ones_n = jnp.ones((nb, n, 8), jnp.float32)
    ones_rows3 = jnp.ones((nb, 8, n), jnp.float32)

    att_heads, dq_heads, dk_heads, dv_heads = [], [], [], []
    dpol_total = jnp.zeros((nb, 8, n), jnp.float32)
    for h in range(num_heads):
        o = h * head_dim
        q = qkv[:, :, o:o + head_dim]
        k = qkv[:, :, hd + o:hd + o + head_dim]
        v = qkv[:, :, 2 * hd + o:2 * hd + o + head_dim]
        gh = datt[:, :, o:o + head_dim]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(
            jnp.where(pad_mask, s, -jnp.inf), axis=-1, keepdims=True
        )
        xe = jnp.exp(s - m)
        e = xe * attn_policy
        den = jax.lax.dot_general(
            e, ones_n, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, :, :1] + eps
        # eps/N smoothing restricted to VALID columns: on the unpadded
        # reference every column is valid; an unmasked cc here would give
        # padded columns p = cc/den and leak into dv / dwqkv
        p = (e + cc * pad_f) / den
        att_heads.append(jax.lax.dot_general(
            p.astype(dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype))
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
        dq_heads.append(jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        dk_heads.append(jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
        dpol_total = dpol_total + jax.lax.dot_general(
            ones_rows3, de * xe * off_diag, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    dpol_ref[:] = dpol_total[:, :1].astype(dpol_ref.dtype)

    att_out = jnp.concatenate(att_heads, axis=2).reshape(rows, hd)
    dqkv = jnp.concatenate(
        dq_heads + dk_heads + dv_heads, axis=2
    ).reshape(rows, 3 * hd).astype(dtype)

    dln_out = jax.lax.dot_general(
        dqkv, wqkv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dz = dln_out * ln_s
    mdz = jax.lax.dot_general(
        dz, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    mdzz = jax.lax.dot_general(
        dz * z, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    dx = rr * (dz - mdz - z * mdzz) * valid + g
    dx_ref[:] = dx.reshape(nb, np_, c).astype(dx_ref.dtype)

    ones_rows = jnp.ones((8, rows), jnp.float32)

    def colsum(a32):
        return jax.lax.dot_general(
            ones_rows, a32, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:1]

    dwproj_c = jax.lax.dot_general(
        att_out, gm.astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbproj_c = colsum(gm)
    dwqkv_c = jax.lax.dot_general(
        ln_out, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbqkv_c = colsum(dqkv.astype(jnp.float32))
    dlns_c = colsum(dln_out * z)
    dlnb_c = colsum(dln_out)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[:] = dwqkv_c.astype(dwqkv_ref.dtype)
        dbqkv_ref[:] = dbqkv_c.astype(dbqkv_ref.dtype)
        dwproj_ref[:] = dwproj_c.astype(dwproj_ref.dtype)
        dbproj_ref[:] = dbproj_c.astype(dbproj_ref.dtype)
        dlns_ref[:] = dlns_c.astype(dlns_ref.dtype)
        dlnb_ref[:] = dlnb_c.astype(dlnb_ref.dtype)

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dwqkv_ref[:] += dwqkv_c.astype(dwqkv_ref.dtype)
        dbqkv_ref[:] += dbqkv_c.astype(dbqkv_ref.dtype)
        dwproj_ref[:] += dwproj_c.astype(dwproj_ref.dtype)
        dbproj_ref[:] += dbproj_c.astype(dbproj_ref.dtype)
        dlns_ref[:] += dlns_c.astype(dlns_ref.dtype)
        dlnb_ref[:] += dlnb_c.astype(dlnb_ref.dtype)


def fused_attention_block_backward_policy(
    x: jnp.ndarray,
    g: jnp.ndarray,
    policy: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wproj: jnp.ndarray,
    num_heads: int,
    *,
    scale: float | None = None,
    eps: float = 1e-6,
    ln_eps: float = 1e-6,
    block_batch: int = 8,
    interpret: bool = False,
):
    """Policy-mode half-block backward: returns
    (dx, dpolicy, dln_scale, dln_bias, dwqkv, dbqkv, dwproj, dbproj)."""
    B, N, C = x.shape
    head_dim = C // num_heads
    if scale is None:
        scale = head_dim ** -0.5
    dtype = x.dtype
    Np = _round_up(N, 16)
    pol = policy.astype(jnp.float32)
    if Np != N:
        x = jnp.pad(x, [(0, 0), (0, Np - N), (0, 0)])
        g = jnp.pad(g, [(0, 0), (0, Np - N), (0, 0)])
        pol = jnp.pad(pol, [(0, 0), (0, Np - N)])
    nb = block_batch
    while B % nb:
        nb //= 2
    nb = max(nb, 1)

    operands = [
        x, pol[:, None, :], g.astype(dtype),
        ln_scale.astype(jnp.float32)[None, :],
        ln_bias.astype(jnp.float32)[None, :],
        wqkv.astype(dtype),
        bqkv.astype(jnp.float32)[None, :],
        wproj.astype(dtype),
    ]
    in_specs = [
        pl.BlockSpec((nb, Np, C), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, 1, Np), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, Np, C), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for op in operands[3:]:
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
    )
    dx, dpol, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj = pl.pallas_call(
        functools.partial(
            _attn_block_bwd_policy_kernel,
            scale=scale, eps=eps, ln_eps=ln_eps, n_valid=N,
            num_heads=num_heads, head_dim=head_dim,
        ),
        grid=(B // nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=safe_cost_estimate(
            flops=7 * 2 * B * num_heads * Np * Np * head_dim
            + 6 * 2 * B * Np * C * 3 * C,
            bytes_accessed=4 * B * Np * C * jnp.dtype(dtype).itemsize,
            transcendentals=B * num_heads * Np * Np,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    dpol = dpol[:, 0, :N]
    if Np != N:
        dx = dx[:, :N]
    return (dx, dpol, dlns[0], dlnb[0], dwqkv, dbqkv[0], dwproj, dbproj[0])
