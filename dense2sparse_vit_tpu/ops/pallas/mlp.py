"""Fused transformer-MLP half-block (Pallas, TPU): x + fc2(act(fc1(LN(x)))).

XLA cannot fuse matmul→matmul, so the unfused MLP materializes the
(B, N, 4C) fc1 activation in HBM between fc1 and fc2 — at ViT-S B=256
N=197 that is ~155 MB written + read per block, ~0.38 ms of pure HBM
traffic per block at v5e bandwidth, for an op that is otherwise
MXU-bound. This kernel runs LayerNorm → fc1 → GELU → fc2 → residual-add
out of VMEM in one pass: HBM sees only x in and x' out.

Same LN-folding trick as the predictor kernel (ops/pallas/predictor.py):
with W1s = scale ⊙ W1 and b1' = bias @ W1 + b1,
    fc1(LN(x)) = r ⊙ (x @ W1s) - (r·mu) ⊙ colsum(W1s) + b1'
so the MXU multiplies the RAW bf16 rows and the per-row LN statistics
(ones-matmul sums, exact-variance algebra in fp32) correct the output.

Differentiable via custom VJP: forward is the kernel, backward
differentiates the jnp reference formula (the training path re-materializes
like XLA would; the kernel's win is the inference/eval path).

Parity: reference Mlp + pre-norm residual (dynamic_vit.py:159-175, 240-283).
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


def _mlp_kernel(x_ref, w1s_ref, cs1_ref, b1p_ref, w2_ref, b2_ref, out_ref,
                *, eps):
    nb, np_, c = x_ref.shape
    rows = nb * np_
    x = x_ref[:].reshape(rows, c)
    x32 = x.astype(jnp.float32)

    # per-row LN statistics via ones-matmuls (lane reductions are VPU-bound;
    # the MXU does them for free); exact-variance algebra in fp32
    ones_c = jnp.ones((c, 8), jnp.float32)
    s = jax.lax.dot_general(
        x32, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1]
    q = jax.lax.dot_general(
        x32 * x32, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1]
    mu = s / c
    var = q / c - mu * mu
    rr = jax.lax.rsqrt(var + eps)

    t = jax.lax.dot_general(
        x, w1s_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, hidden) fp32
    y = rr * t - (rr * mu) * cs1_ref[:].astype(jnp.float32) \
        + b1p_ref[:].astype(jnp.float32)
    g = _gelu_exact(y.astype(x.dtype))
    o = jax.lax.dot_general(
        g, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:].astype(jnp.float32)
    out_ref[:] = (x32 + o).reshape(nb, np_, c).astype(out_ref.dtype)


def _reference_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    """jnp formula (flax LayerNorm use_fast_variance=False + Dense chain)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    h = ((x32 - mu) * jax.lax.rsqrt(var + eps)
         * ln_scale.astype(jnp.float32)
         + ln_bias.astype(jnp.float32)).astype(x.dtype)
    h = h @ w1 + b1.astype(x.dtype)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    h = h @ w2 + b2.astype(x.dtype)
    return x + h


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_mlp_residual(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    eps: float = 1e-6,
    block_batch: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + fc2(gelu(fc1(LN(x)))) in one VMEM pass. x: (B, N, C)."""
    B, N, C = x.shape
    dtype = x.dtype
    Np = _round_up(N, 16)
    xp = jnp.pad(x, [(0, 0), (0, Np - N), (0, 0)]) if Np != N else x
    nb = block_batch
    while B % nb:
        nb //= 2
    nb = max(nb, 1)

    # fold LN scale into fc1; LN bias @ W1 + b1 into one bias row; the mu
    # correction uses the column sums of the QUANTIZED kernel (the matrix
    # the MXU actually multiplies)
    w1s = (ln_scale.astype(jnp.float32)[:, None]
           * w1.astype(jnp.float32)).astype(dtype)
    cs1 = jnp.sum(w1s.astype(jnp.float32), axis=0, keepdims=True)
    b1p = (ln_bias.astype(jnp.float32) @ w1.astype(jnp.float32)
           + b1.astype(jnp.float32))[None, :]
    operands = [xp, w1s, cs1, b1p, w2.astype(dtype),
                b2.astype(jnp.float32)[None, :]]

    in_specs = [pl.BlockSpec((nb, Np, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    for op in operands[1:]:
        in_specs.append(
            pl.BlockSpec(op.shape, lambda b, nd=op.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )
    hidden = w1.shape[1]
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps),
        grid=(B // nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb, Np, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Np * C * hidden,
            bytes_accessed=2 * B * Np * C * jnp.dtype(dtype).itemsize,
            transcendentals=B * Np * hidden,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :N] if Np != N else out


def _fmr_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, block_batch,
             interpret):
    out = fused_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2, eps,
                             block_batch, interpret)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _fmr_bwd(eps, block_batch, interpret, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _reference_mlp_residual(*a, eps), x, ln_scale, ln_bias,
        w1, b1, w2, b2,
    )
    return vjp(g)


fused_mlp_residual.defvjp(_fmr_fwd, _fmr_bwd)
