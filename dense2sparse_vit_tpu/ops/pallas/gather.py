"""Fused token gather (Pallas, TPU): rows of x selected by per-sample indices.

XLA lowers `jnp.take_along_axis(x, idx[..., None], axis=1)` on the token
axis to a generic gather that, measured in-model, costs ~1.9 ms per pruning
stage at (256, 197->138, 384) bf16 — ~25x the HBM bandwidth bound and ~20%
of the whole pruned forward (the reference's `batch_index_select`,
dynamic_vit.py:21-32, has the same role on GPU).

On TPU the fastest way to move rows selected by dynamic indices is to NOT
move them: build the (K, N) one-hot selection matrix in VMEM from an iota
comparison and hand the MXU one (K, N) @ (N, D) matmul per sample
(~6 GFLOP per stage at the shapes above — two orders of magnitude below
the chip's matmul rate, and the one-hot never exists in HBM).

The backward of a gather is a scatter-add, which is the SAME matmul
transposed: dx = onehot^T @ dout. Both directions are Pallas kernels under
one custom VJP, so the hard-gather training path (student.py token
selection) is fully fused too. Out-of-range indices (< 0 or >= N) produce
zero rows, matching the padding convention (index -1 = padded slot).
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


def _gather_kernel(x_ref, idx_ref, out_ref, *, nb):
    """out[b] = onehot(idx[b]) @ x[b] for nb samples per program."""
    _, n, _ = x_ref.shape
    kp = idx_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (kp, n), 1)

    def body(b, _):
        idx = idx_ref[b]  # (Kp,) int32
        onehot = (idx[:, None] == col).astype(x_ref.dtype)
        out_ref[b] = jax.lax.dot_general(
            onehot, x_ref[b], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)
        return _

    jax.lax.fori_loop(0, nb, body, None)


def _scatter_kernel(g_ref, idx_ref, dx_ref, *, nb):
    """dx[b] = onehot(idx[b])^T @ g[b] (scatter-add of the cotangent)."""
    _, n, _ = dx_ref.shape
    kp = idx_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (kp, n), 1)

    def body(b, _):
        idx = idx_ref[b]
        onehot = (idx[:, None] == col).astype(g_ref.dtype)
        dx_ref[b] = jax.lax.dot_general(
            onehot, g_ref[b], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dx_ref.dtype)
        return _

    jax.lax.fori_loop(0, nb, body, None)


def _pallas_gather(x, idx, *, block_batch, interpret, kernel_fn, out_rows):
    """Shared pallas_call driver for both directions.

    kernel_fn reads (data, idx) and writes (B, out_rows, D); data rows are
    x's rows (forward) or the cotangent's rows (backward).
    """
    B, n_in, D = x.shape
    k_in = idx.shape[1]
    np_ = _round_up(n_in, 16)
    kp = _round_up(k_in, 16)
    orp = _round_up(out_rows, 16)
    if np_ != n_in:
        x = jnp.pad(x, [(0, 0), (0, np_ - n_in), (0, 0)])
    if kp != k_in:
        # -1 never matches the iota: padded slots select nothing
        idx = jnp.pad(idx, [(0, 0), (0, kp - k_in)], constant_values=-1)
    nb = block_batch
    while B % nb:
        nb //= 2
    nb = max(nb, 1)

    out = pl.pallas_call(
        functools.partial(kernel_fn, nb=nb),
        grid=(B // nb,),
        in_specs=[
            pl.BlockSpec((nb, np_, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, kp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, orp, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, orp, D), x.dtype),
        cost_estimate=safe_cost_estimate(
            flops=2 * B * kp * np_ * D,
            bytes_accessed=B * (np_ + orp) * D * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, idx.astype(jnp.int32))
    return out[:, :out_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_gather_tokens(
    x: jnp.ndarray,
    idx: jnp.ndarray,
    block_batch: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, N, D) tokens gathered by (B, K) indices -> (B, K, D), on the MXU.

    Drop-in for `jnp.take_along_axis(x, idx[..., None], axis=1)` with a
    fused scatter backward. Gradients flow to x only (idx is integer).
    """
    return _pallas_gather(
        x, idx, block_batch=block_batch, interpret=interpret,
        kernel_fn=_gather_kernel, out_rows=idx.shape[1],
    )


def _fgt_fwd(x, idx, block_batch, interpret):
    out = fused_gather_tokens(x, idx, block_batch, interpret)
    return out, (idx, x.shape[1])


def _fgt_bwd(block_batch, interpret, res, g):
    idx, n_in = res
    # dx[b, n] = sum_k 1[idx[b,k]==n] * g[b,k]: the transposed one-hot
    # contraction, with the output padded back to N rows
    dx = _pallas_gather(
        g, idx, block_batch=block_batch, interpret=interpret,
        kernel_fn=_scatter_kernel, out_rows=n_in,
    )
    return dx, None


fused_gather_tokens.defvjp(_fgt_fwd, _fgt_bwd)
