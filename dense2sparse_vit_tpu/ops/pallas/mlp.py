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

Differentiable via custom VJP with a FUSED backward kernel too
(`fused_mlp_residual_backward`): one recompute-in-VMEM pass emits dx and
accumulates all six parameter gradients across the sequential grid — the
fc1 activation stays out of HBM in BOTH directions.

Parity: reference Mlp + pre-norm residual (dynamic_vit.py:159-175, 240-283).
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
        cost_estimate=safe_cost_estimate(
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
    dx, dlns, dlnb, dw1, db1, dw2, db2 = fused_mlp_residual_backward(
        x, g, ln_scale, ln_bias, w1, b1, w2,
        eps=eps, block_batch=block_batch, interpret=interpret,
    )
    return (
        dx,
        dlns.astype(ln_scale.dtype), dlnb.astype(ln_bias.dtype),
        dw1.astype(w1.dtype), db1.astype(b1.dtype),
        dw2.astype(w2.dtype), db2.astype(b2.dtype),
    )


fused_mlp_residual.defvjp(_fmr_fwd, _fmr_bwd)


# ---------------------------------------------------------------------------
# Fused backward of the MLP half-block
# ---------------------------------------------------------------------------


def _gelu_grad(y32):
    """d/dy gelu(y) = Phi(y) + y * phi(y), fp32 (exact, erf polynomial)."""
    from dense2sparse_vit_tpu.ops.pallas.predictor import _erf

    inv_sqrt2 = 2.0 ** -0.5
    inv_sqrt2pi = 0.3989422804014327
    phi = jnp.exp(-0.5 * y32 * y32) * inv_sqrt2pi
    return 0.5 * (1.0 + _erf(y32 * inv_sqrt2)) + y32 * phi


def _mlp_bwd_kernel(x_ref, g_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                    dx_ref, dlns_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref, *, eps, n_valid):
    """Recompute-in-VMEM backward of x + fc2(gelu(fc1(LN(x)))).

    Per program: recompute the forward intermediates for its nb rows, emit
    dx for those rows, and ACCUMULATE the weight/LN-parameter gradients into
    constant-index outputs (the grid is sequential on TPU, so read-modify-
    write accumulation across programs is sound; program 0 initializes).
    Padded tail rows are excluded from every weight-gradient reduction via a
    row mask (their dx rows are garbage that the caller slices off).
    """
    nb, np_, c = x_ref.shape
    rows = nb * np_
    x = x_ref[:].reshape(rows, c)
    g = g_ref[:].reshape(rows, c).astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    dtype = x.dtype

    # forward recompute (flax semantics: LN fp32, matmul in model dtype)
    ones_c = jnp.ones((c, 8), jnp.float32)
    mu = jax.lax.dot_general(
        x32, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    d = x32 - mu
    var = jax.lax.dot_general(
        d * d, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    rr = jax.lax.rsqrt(var + eps)
    z = d * rr  # (rows, c) fp32, pre scale/bias
    ln_s = lns_ref[:].astype(jnp.float32)  # (1, c)
    ln_out = (z * ln_s + lnb_ref[:].astype(jnp.float32)).astype(dtype)
    w1 = w1_ref[:]
    y = jax.lax.dot_general(
        ln_out, w1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)  # (rows, hidden) fp32
    act = _gelu_exact(y.astype(dtype))  # (rows, hidden) dtype

    # padded-token row mask for weight-grad reductions: a padded row's x is
    # zero but LN bias/b1 make its activations nonzero — mask before reduce
    tok = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % np_
    valid = (tok < n_valid).astype(jnp.float32)
    gm = g * valid

    w2 = w2_ref[:]
    da2 = jax.lax.dot_general(
        gm.astype(dtype), w2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, hidden) = dout @ W2^T
    dy = da2 * _gelu_grad(y)
    dln_out = jax.lax.dot_general(
        dy.astype(dtype), w1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, c) = dy @ W1^T
    dz = dln_out * ln_s
    # LayerNorm backward: dx = rr * (dz - mean(dz) - z * mean(dz * z))
    mdz = jax.lax.dot_general(
        dz, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    mdzz = jax.lax.dot_general(
        dz * z, ones_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :1] / c
    dx = rr * (dz - mdz - z * mdzz) * valid + g  # + residual cotangent
    dx_ref[:] = dx.reshape(nb, np_, c).astype(dx_ref.dtype)

    # parameter gradients (masked rows excluded), accumulated across the grid
    ones_rows = jnp.ones((8, rows), jnp.float32)
    dym = dy * valid

    def colsum(a32):  # (rows, k) -> (1, k)
        return jax.lax.dot_general(
            ones_rows, a32, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[:1]

    dw2_c = jax.lax.dot_general(
        act, gm.astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (hidden, c); act rows at padded slots are masked via gm
    db2_c = colsum(gm)
    dw1_c = jax.lax.dot_general(
        ln_out, dym.astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (c, hidden); ln_out padded rows masked via dym
    db1_c = colsum(dym)
    dlns_c = colsum(dln_out * z * valid)
    dlnb_c = colsum(dln_out * valid)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = dw1_c.astype(dw1_ref.dtype)
        db1_ref[:] = db1_c.astype(db1_ref.dtype)
        dw2_ref[:] = dw2_c.astype(dw2_ref.dtype)
        db2_ref[:] = db2_c.astype(db2_ref.dtype)
        dlns_ref[:] = dlns_c.astype(dlns_ref.dtype)
        dlnb_ref[:] = dlnb_c.astype(dlnb_ref.dtype)

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dw1_ref[:] += dw1_c.astype(dw1_ref.dtype)
        db1_ref[:] += db1_c.astype(db1_ref.dtype)
        dw2_ref[:] += dw2_c.astype(dw2_ref.dtype)
        db2_ref[:] += db2_c.astype(db2_ref.dtype)
        dlns_ref[:] += dlns_c.astype(dlns_ref.dtype)
        dlnb_ref[:] += dlnb_c.astype(dlnb_ref.dtype)


def fused_mlp_residual_backward(
    x: jnp.ndarray,
    g: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    *,
    eps: float = 1e-6,
    block_batch: int = 8,
    interpret: bool = False,
):
    """All seven cotangents of fused_mlp_residual in one kernel pass.

    Returns (dx, dln_scale, dln_bias, dw1, db1, dw2, db2) — weight grads in
    fp32 (accumulated across the whole batch), dx in x.dtype.
    """
    B, N, C = x.shape
    hidden = w1.shape[1]
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
        w1.astype(dtype), b1.astype(jnp.float32)[None, :],
        w2.astype(dtype),
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
        cspec((C, hidden)), cspec((1, hidden)),
        cspec((hidden, C)), cspec((1, C)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, Np, C), dtype),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((C, hidden), jnp.float32),
        jax.ShapeDtypeStruct((1, hidden), jnp.float32),
        jax.ShapeDtypeStruct((hidden, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
    )
    dx, dlns, dlnb, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps=eps, n_valid=N),
        grid=(B // nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=safe_cost_estimate(
            flops=12 * B * Np * C * hidden,
            bytes_accessed=4 * B * Np * C * jnp.dtype(dtype).itemsize,
            transcendentals=2 * B * Np * hidden,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    if Np != N:
        dx = dx[:, :N]
    return (dx, dlns[0], dlnb[0], dw1, db1[0], dw2, db2[0])
