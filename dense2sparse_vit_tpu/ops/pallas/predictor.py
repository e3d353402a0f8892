"""Fused PredictorLG score-head kernel (Pallas, TPU).

The reference's PredictorLG (/root/reference/vit_models/dynamic_vit.py:370-560)
is a pyramid of LayerNorm -> Dense -> activation units with a local/global
channel split in the middle. Unfused, every unit round-trips a (B*N, width)
activation through HBM between matmuls; fused, the whole chain runs out of
VMEM in one pass over the input.

Design:
  * grid over batch blocks; each program flattens its nb samples into ONE
    (nb*Np, width) row batch so every Dense is a large MXU matmul (a
    per-sample variant measured SLOWER than XLA's unfused chain — (208, w)
    matmuls cannot fill the MXU);
  * the per-sample valid-token mean pool (the only cross-token coupling,
    dynamic_vit.py:538-544) is one (8, nb*Np) pooling-matrix matmul;
  * LayerNorm statistics via ones-matmuls (lane reductions are the VPU
    bottleneck; the MXU does them for free), exact-variance semantics
    matching flax `use_fast_variance=False`;
  * activations stay in the model dtype between units (mirroring flax
    Dense(dtype=...) behavior), fp32 inside each LayerNorm; exact GELU via
    an erf polynomial (Mosaic has no erf lowering);
  * the final Dense(->1) is computed as a (8, C) x (rows, C)^T contraction
    so the scores land lane-major — no (rows, 1) relayout;
  * padded tail tokens are excluded from the mean pool and sliced from the
    output.

LN variants only (small + large); the BN variant keeps the flax path (its
batch statistics couple samples across the whole batch, and the reference
never ran it in production either). Used on the deterministic/eval path —
training keeps the autodiff-able flax module (predictor FLOPs are a small
share of the training step, which is dominated by the backward).
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


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7 — far below
    bf16 resolution). Mosaic has no erf/erfc lowering, so exact-GELU inside
    the kernel needs a polynomial."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(h):
    """0.5 x (1 + erf(x / sqrt(2))) in fp32 — matches
    jax.nn.gelu(approximate=False) to ~1e-7."""
    h32 = h.astype(jnp.float32)
    return (0.5 * h32 * (1.0 + _erf(h32 * (2.0 ** -0.5)))).astype(h.dtype)


def _layer_norm(h, scale, bias, eps, ones_c):
    """Exact-variance LayerNorm over the lane (channel) dim.

    h: (rows, C) any float dtype; scale/bias: (1, C). Returns fp32 (rows, C).
    Reductions via ones-matmul: mu = h @ 1/C, var = (h-mu)^2 @ 1/C.
    """
    h32 = h.astype(jnp.float32)
    c = h32.shape[1]
    mu = jax.lax.dot_general(
        h32, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    d = h32 - mu
    var = jax.lax.dot_general(
        d * d, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    return d * jax.lax.rsqrt(var + eps) * scale + bias


def _predictor_kernel(x_ref, *refs, n_in, n_out, n_valid, act, eps, dtype):
    """One program: nb full samples, flattened to (nb*Np, width) row batches.

    refs layout: per in unit (ln_scale, ln_bias, kernel, bias) x n_in, then
    the SPLIT out_0 unit (ws_top (c2, w0), ws_bot (c-c2, w0),
    colsum_ws (1, w0), b' (1, w0)), then (ln_scale, ln_bias, kernel, bias)
    x (n_out - 1), then final_ln_scale, final_ln_bias, final_w8 (8, C_last),
    final_b (1, 1), then the output ref (1, 1, nb*Np).

    out_0 exploits the rank-1 structure of its input's global half (every
    row of a sample shares ONE pooled vector, dynamic_vit.py:538-544): with
    the LayerNorm folded into the weights,
        LN(concat) @ W = r * (local @ Ws_top + glob @ Ws_bot)
                         - (r * mu) * colsum(Ws) + (bias @ W + b)
    the glob contraction collapses to a per-SAMPLE (nbp, c-c2) @ (c-c2, w0)
    matmul — 1/Np of the dense cost — so out_0's MXU work halves (~27% of
    the whole predictor's FLOPs for the large variant). mu/var come from
    ones-matmul row sums of the local half plus per-sample global scalars
    (algebraically identical to the two-pass variance: fp32 throughout).
    """
    out_ref = refs[-1]
    w_refs = refs[:-1]
    nb, np_, d_in = x_ref.shape
    rows = nb * np_

    def activation(h):
        if act == "gelu":
            return _gelu_exact(h)
        return jnp.maximum(h, 0)

    def unit(h, i, ones_c):
        scale = w_refs[4 * i][:].astype(jnp.float32)
        bias = w_refs[4 * i + 1][:].astype(jnp.float32)
        w = w_refs[4 * i + 2][:]
        b = w_refs[4 * i + 3][:]
        h = _layer_norm(h, scale, bias, eps, ones_c).astype(dtype)
        h = jax.lax.dot_general(
            h, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype) + b
        return activation(h)

    h = x_ref[:].reshape(rows, d_in)
    ones = jnp.ones((d_in, 8), jnp.float32)
    for i in range(n_in):
        h = unit(h, i, ones)
        ones = jnp.ones((h.shape[1], 8), jnp.float32)

    # local/global split (dynamic_vit.py:538-544): first half channels
    # per-token, second half mean-pooled over each sample's VALID tokens —
    # one (nbp, rows) pooling matmul, row s = indicator(sample s)/n_valid
    c = h.shape[1]
    c2 = c // 2
    local = h[:, :c2]
    nbp = max(8, nb)  # sublane-aligned pooling-matrix height
    row_id = jax.lax.broadcasted_iota(jnp.int32, (nbp, rows), 0)
    col_id = jax.lax.broadcasted_iota(jnp.int32, (nbp, rows), 1)
    pool = jnp.where(
        (col_id // np_ == row_id) & (col_id % np_ < n_valid),
        1.0 / n_valid, 0.0,
    )
    means32 = jax.lax.dot_general(
        pool, h[:, c2:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (nbp, c - c2); row s = sample s's mean (s < nb)
    # quantize like the reference's concat does (glob enters out_0 in the
    # model dtype), then take per-sample stats from the quantized values
    means_q = means32.astype(dtype)
    mq32 = means_q.astype(jnp.float32)

    base = 4 * n_in
    ws_top = w_refs[base][:]                            # (c2, w0)
    ws_bot = w_refs[base + 1][:]                        # (c - c2, w0)
    colsum_ws = w_refs[base + 2][:].astype(jnp.float32)  # (1, w0)
    bprime = w_refs[base + 3][:].astype(jnp.float32)     # (1, w0)

    # LN stats: per-row local sums + per-sample global sums (ones-matmuls)
    l32 = local.astype(jnp.float32)
    ones_c2 = jnp.ones((c2, 8), jnp.float32)
    s_l = jax.lax.dot_general(
        l32, ones_c2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1]
    q_l = jax.lax.dot_general(
        l32 * l32, ones_c2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1]
    ones_cg = jnp.ones((c - c2, 8), jnp.float32)
    # kept 8 lanes wide (all columns equal) so the expand matmuls below
    # never produce 1-lane outputs
    s_g = jax.lax.dot_general(
        mq32, ones_cg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q_g = jax.lax.dot_general(
        mq32 * mq32, ones_cg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # split matmuls: per-token local half, per-SAMPLE global half
    t1 = jax.lax.dot_general(
        local, ws_top, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, w0)
    t2 = jax.lax.dot_general(
        means_q, ws_bot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (nbp, w0)
    # expand per-sample quantities back to token rows (indicator matmuls)
    expand = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (rows, nbp), 0) // np_
        == jax.lax.broadcasted_iota(jnp.int32, (rows, nbp), 1),
        1.0, 0.0,
    )
    t2x = jax.lax.dot_general(
        expand, t2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sx = jax.lax.dot_general(
        expand, s_g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1]
    qx = jax.lax.dot_general(
        expand, q_g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1]
    mu = (s_l + sx) / c
    var = (q_l + qx) / c - mu * mu
    rr = jax.lax.rsqrt(var + eps)
    y = rr * (t1 + t2x) - (rr * mu) * colsum_ws + bprime
    h = activation(y.astype(dtype))
    ones = jnp.ones((h.shape[1], 8), jnp.float32)
    for i in range(1, n_out):
        h = unit(h, n_in + i, ones)
        ones = jnp.ones((h.shape[1], 8), jnp.float32)

    fscale = w_refs[4 * (n_in + n_out)][:].astype(jnp.float32)
    fbias = w_refs[4 * (n_in + n_out) + 1][:].astype(jnp.float32)
    fw8 = w_refs[4 * (n_in + n_out) + 2][:]
    fb = w_refs[4 * (n_in + n_out) + 3][0, 0]
    h = _layer_norm(h, fscale, fbias, eps, ones).astype(dtype)
    s8 = jax.lax.dot_general(
        fw8, h, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (8, rows); row 0 = scores, lane-major
    out_ref[:] = (
        (s8[:1] + fb.astype(jnp.float32)).reshape(1, 1, rows)
    ).astype(out_ref.dtype)


def fused_predictor_lg(
    x: jnp.ndarray,
    params,
    *,
    act: str = "relu",
    eps: float = 1e-5,
    block_batch: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused PredictorLG forward: (B, N, D) tokens -> (B, N) raw scores.

    Args:
      x: (B, N, D) spatial tokens (no CLS slot).
      params: the flax param tree of `nn.predictor.PredictorLG` (LN variant):
        `in_{i}` / `out_{i}` units ({norm: {scale, bias}, dense: {kernel,
        bias}}), `final_norm`, `final_dense`.
      act: 'relu' (large / BN-small) or 'gelu' (LN small variant).
    """
    B, N, D = x.shape
    dtype = x.dtype

    n_in = sum(1 for k in params if k.startswith("in_"))
    n_out = sum(1 for k in params if k.startswith("out_"))

    operands = [x]
    for i in range(n_in):
        unit = params[f"in_{i}"]
        operands += [
            unit["norm"]["scale"][None, :],
            unit["norm"]["bias"][None, :],
            unit["dense"]["kernel"].astype(dtype),
            unit["dense"]["bias"][None, :].astype(dtype),
        ]
    # out_0 in folded/split form (see _predictor_kernel): scale into the
    # kernel, bias@W + b into one bias row, colsum of the QUANTIZED kernel
    # (the matrix the MXU actually multiplies) for the mu correction
    u0 = params["out_0"]
    scale0 = u0["norm"]["scale"].astype(jnp.float32)
    bias0 = u0["norm"]["bias"].astype(jnp.float32)
    w0k = u0["dense"]["kernel"].astype(jnp.float32)
    b0 = u0["dense"]["bias"].astype(jnp.float32)
    ws = (scale0[:, None] * w0k).astype(dtype)
    c_in = ws.shape[0]
    c2 = c_in // 2
    operands += [
        ws[:c2],
        ws[c2:],
        jnp.sum(ws.astype(jnp.float32), axis=0, keepdims=True),
        (bias0 @ w0k + b0)[None, :],
    ]
    for i in range(1, n_out):
        unit = params[f"out_{i}"]
        operands += [
            unit["norm"]["scale"][None, :],
            unit["norm"]["bias"][None, :],
            unit["dense"]["kernel"].astype(dtype),
            unit["dense"]["bias"][None, :].astype(dtype),
        ]
    fw = params["final_dense"]["kernel"]  # (C_last, 1)
    c_last = fw.shape[0]
    fw8 = jnp.zeros((8, c_last), dtype).at[0].set(fw[:, 0].astype(dtype))
    operands += [
        params["final_norm"]["scale"][None, :],
        params["final_norm"]["bias"][None, :],
        fw8,
        params["final_dense"]["bias"].reshape(1, 1),
    ]

    Np = _round_up(N, 16)
    pad = Np - N
    if pad:
        operands[0] = jnp.pad(x, [(0, 0), (0, pad), (0, 0)])
    nb = block_batch  # pooling matrix sized to nb (sublane-padded to >= 8)
    while B % nb:
        nb //= 2
    nb = max(nb, 1)

    in_specs = [
        pl.BlockSpec((nb, Np, D), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    # weights: constant index map — Pallas keeps them resident across
    # sequential grid steps (no per-program re-fetch)
    for op in operands[1:]:
        in_specs.append(
            pl.BlockSpec(op.shape, lambda b, nd=op.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _predictor_kernel,
        n_in=n_in,
        n_out=n_out,
        n_valid=N,
        act=act,
        eps=eps,
        dtype=dtype,
    )
    flops = 2 * B * Np * sum(
        int(op.shape[0]) * int(op.shape[1])
        for op in operands[1:]
        if op.ndim == 2 and op.shape[0] > 8
    )
    # scores come out lane-major: (grid, 1, nb*Np), reshaped to (B, Np)
    # below (the trailing block dims equal the array dims, so Mosaic
    # accepts any nb)
    out = pl.pallas_call(
        kernel,
        grid=(B // nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, nb * Np), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // nb, 1, nb * Np), dtype),
        cost_estimate=safe_cost_estimate(
            flops=flops,
            bytes_accessed=B * Np * D * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, Np)[:, :N]
