"""Int8 whole-block inference kernel (Pallas, TPU) — the quantized serving
path.

TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate, and the
four projection matmuls (qkv / proj / fc1 / fc2) are ~92% of a ViT block's
FLOPs (BENCHMARKS.md roofline). This kernel runs those four matmuls on the
int8 MXU path with standard post-training quantization:

  * weights:     per-output-channel symmetric int8 (scale = absmax/127),
                 quantized once outside the kernel (constant-folded by XLA
                 under AOT export, where weights are literals);
  * activations: per-row (per-token) dynamic symmetric int8, computed
                 in-kernel right before each matmul;
  * accumulation in int32, dequantized as acc * (row_scale x col_scale);
  * LayerNorm row stats, softmax, GELU, and residuals stay fp32/bf16 —
    the attention score/value dots (8% of FLOPs, already sub-50% MXU
    utilization at head_dim=64) keep the bf16 path.

Dense (policy-free) mode only: the flagship serving graph — topk student at
eval — gathers survivor tokens with static K and runs every block
policy-free, so this covers 100% of its block time. Threshold-mode serving
(data-dependent masks) stays on the bf16 policy kernel.

No reference counterpart (the reference has no quantization or serving
story); this is beyond-parity TPU-native machinery. Block wiring:
nn/layers.py (ModelConfig.quant == "int8").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from dense2sparse_vit_tpu.ops.pallas._cost import safe_cost_estimate
from jax.experimental.pallas import tpu as pltpu

from dense2sparse_vit_tpu.ops.pallas.predictor import _gelu_exact


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def quantize_weight(w) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8: returns (w_q int8, scale (1, out))."""
    w32 = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w32), axis=0, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def quantize_block_params(params: dict) -> dict:
    """PTQ of one block's params dict (the fused_transformer_block layout).

    Biases and LayerNorm affines stay fp32; the four projection weights get
    per-output-channel int8 values + scales.
    """
    wqkv_q, sqkv = quantize_weight(params["wqkv"])
    wproj_q, sproj = quantize_weight(params["wproj"])
    w1_q, s1 = quantize_weight(params["w1"])
    w2_q, s2 = quantize_weight(params["w2"])
    return {
        "ln1_scale": params["ln1_scale"].astype(jnp.float32),
        "ln1_bias": params["ln1_bias"].astype(jnp.float32),
        "wqkv_q": wqkv_q, "sqkv": sqkv,
        "bqkv": params["bqkv"].astype(jnp.float32),
        "wproj_q": wproj_q, "sproj": sproj,
        "bproj": params["bproj"].astype(jnp.float32),
        "ln2_scale": params["ln2_scale"].astype(jnp.float32),
        "ln2_bias": params["ln2_bias"].astype(jnp.float32),
        "w1_q": w1_q, "s1": s1,
        "b1": params["b1"].astype(jnp.float32),
        "w2_q": w2_q, "s2": s2,
        "b2": params["b2"].astype(jnp.float32),
    }


def _quantize_rows(h32):
    """Per-row symmetric int8 of a (rows, d) fp32 tile -> (q, scale)."""
    absmax = jnp.max(jnp.abs(h32), axis=-1, keepdims=True)
    s = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(h32 / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _qmatmul(h32, wq, col_scale, bias):
    """quantize(h) @ wq on the int8 MXU path, dequantized + bias (fp32)."""
    q, row_s = _quantize_rows(h32)
    acc = jax.lax.dot_general(
        q, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (row_s * col_scale.astype(jnp.float32)) \
        + bias.astype(jnp.float32)


def _quant_block_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, sqkv_ref,
                        bqkv_ref, wproj_ref, sproj_ref, bproj_ref, ln2s_ref,
                        ln2b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                        b2_ref, out_ref, *, scale, ln_eps, n_valid,
                        num_heads, head_dim):
    nb, np_, c = x_ref.shape
    rows = nb * np_
    hd = num_heads * head_dim
    n = np_
    dtype = x_ref.dtype
    ones_c = jnp.ones((c, 8), jnp.float32)

    def layernorm(h32, ln_s, ln_b):
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
        return d * rr * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)

    # ---- attention half: LN1 -> q8 qkv -> bf16 attention -> q8 proj ----
    x2 = x_ref[:].reshape(rows, c)
    x32 = x2.astype(jnp.float32)
    ln1 = layernorm(x32, ln1s_ref[:], ln1b_ref[:])
    rowtok = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % n
    row_valid = (rowtok < n_valid).astype(jnp.float32)
    qkv = (
        _qmatmul(ln1, wqkv_ref[:], sqkv_ref[:], bqkv_ref[:]) * row_valid
    ).astype(dtype).reshape(nb, n, 3 * hd)

    col = jax.lax.broadcasted_iota(jnp.int32, (nb, n, n), 2)
    pad_mask = col < n_valid

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
        # clip-softmax (inference fast path, see _block_kernel): exact
        # while |scaled logits| <= 30 — one ulp at bf16 in practice
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
        head_outs.append((num / den).astype(dtype))

    attn_out = jnp.concatenate(head_outs, axis=2).reshape(rows, hd)
    proj = _qmatmul(
        attn_out.astype(jnp.float32), wproj_ref[:], sproj_ref[:],
        bproj_ref[:],
    )
    xmid32 = x32 + proj

    # ---- MLP half: LN2 -> q8 fc1 -> gelu -> q8 fc2 (all in VMEM) ----
    ln2 = layernorm(xmid32, ln2s_ref[:], ln2b_ref[:])
    y = _qmatmul(ln2, w1_ref[:], s1_ref[:], b1_ref[:])
    act = _gelu_exact(y.astype(dtype)).astype(jnp.float32)
    o2 = _qmatmul(act, w2_ref[:], s2_ref[:], b2_ref[:])
    out_ref[:] = (xmid32 + o2).reshape(nb, np_, c).astype(out_ref.dtype)


def fused_transformer_block_int8(
    x: jnp.ndarray,
    params: dict,
    num_heads: int,
    *,
    scale: float | None = None,
    ln_eps: float = 1e-6,
    block_batch: int = 8,
    interpret: bool = False,
):
    """One whole pre-norm block, int8 projections, dense (policy-free) mode.

    Args:
      x: (B, N, C) residual stream.
      params: the ORIGINAL (unquantized) fused_transformer_block params
        dict — quantization happens here, outside the kernel, so under AOT
        export (weights are literals) XLA constant-folds it to nothing; in
        a live jit it costs one elementwise pass over the weights per call.
        Pass a pre-built quantize_block_params(...) dict to skip that.
    """
    B, N, C = x.shape
    head_dim = C // num_heads
    if scale is None:
        scale = head_dim ** -0.5
    dtype = x.dtype
    Np = _round_up(N, 16)
    pad = Np - N
    xp = jnp.pad(x, [(0, 0), (0, pad), (0, 0)]) if pad else x
    nb = block_batch
    while B % nb:
        nb //= 2
    nb = max(nb, 1)

    qp = params if "wqkv_q" in params else quantize_block_params(params)
    operands = [
        xp,
        qp["ln1_scale"][None, :], qp["ln1_bias"][None, :],
        qp["wqkv_q"], qp["sqkv"], qp["bqkv"][None, :],
        qp["wproj_q"], qp["sproj"], qp["bproj"][None, :],
        qp["ln2_scale"][None, :], qp["ln2_bias"][None, :],
        qp["w1_q"], qp["s1"], qp["b1"][None, :],
        qp["w2_q"], qp["s2"], qp["b2"][None, :],
    ]
    in_specs = [
        pl.BlockSpec((nb, Np, C), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for op in operands[1:]:
        in_specs.append(
            pl.BlockSpec(op.shape, lambda b, nd=op.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )
    hidden = qp["w1_q"].shape[1]
    out = pl.pallas_call(
        functools.partial(
            _quant_block_kernel,
            scale=scale, ln_eps=ln_eps, n_valid=N,
            num_heads=num_heads, head_dim=head_dim,
        ),
        grid=(B // nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb, Np, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), dtype),
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
    return out[:, :N] if pad else out


def _ref_quant_block(x, params, num_heads, scale=None, ln_eps=1e-6):
    """Independent jnp twin of the int8 block (test oracle).

    Same quantization spec (per-output-channel weights, per-row dynamic
    activations, int32 accumulation, clip-softmax attention), vectorized
    over heads instead of the kernel's per-head loop.
    """
    B, N, C = x.shape
    head_dim = C // num_heads
    if scale is None:
        scale = head_dim ** -0.5
    dtype = x.dtype
    qp = params if "wqkv_q" in params else quantize_block_params(params)

    def ln(h32, s, b):
        mu = jnp.mean(h32, axis=-1, keepdims=True)
        var = jnp.mean((h32 - mu) ** 2, axis=-1, keepdims=True)
        return (h32 - mu) * jax.lax.rsqrt(var + ln_eps) * s + b

    def qmm(h32, wq, cs, bias):
        absmax = jnp.max(jnp.abs(h32), axis=-1, keepdims=True)
        rs = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(h32 / rs), -127.0, 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q, wq, (((h32.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * (rs * cs.astype(jnp.float32)) + bias

    x32 = x.astype(jnp.float32)
    qkv = qmm(
        ln(x32, qp["ln1_scale"], qp["ln1_bias"]),
        qp["wqkv_q"], qp["sqkv"][0], qp["bqkv"],
    ).astype(dtype)
    qkv = qkv.reshape(B, N, 3, num_heads, head_dim)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    s = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    e = jnp.exp(jnp.clip(s, -30.0, 30.0)).astype(dtype)
    den = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    att = jnp.einsum(
        "bhnm,bhmd->bhnd", e, v, preferred_element_type=jnp.float32
    ) / den
    att = att.transpose(0, 2, 1, 3).reshape(B, N, C).astype(dtype)
    xmid = x32 + qmm(
        att.astype(jnp.float32), qp["wproj_q"], qp["sproj"][0], qp["bproj"]
    )
    y = qmm(
        ln(xmid, qp["ln2_scale"], qp["ln2_bias"]),
        qp["w1_q"], qp["s1"][0], qp["b1"],
    )
    act = _gelu_exact(y.astype(dtype)).astype(jnp.float32)
    out = xmid + qmm(act, qp["w2_q"], qp["s2"][0], qp["b2"])
    return out.astype(dtype)
