"""block_batch sweep over the fused Pallas kernels on the real chip.

Times each fused kernel (attention half-block, MLP half-block, whole block
forward, whole-block backward) across block_batch settings at the flagship
DeiT-S shapes — the per-stage sequence lengths of the keep-0.7/0.49/0.343
schedule (N = 197, 138, 97, 68 before tile padding) — and prints a markdown
table with ms/call and bf16 MFU so the auto-select tables in
attention.py/block.py can be re-derived from measurement instead of lore.

MFU counts algorithmic matmul FLOPs (8BNC^2 + 4BN^2C for the attention half,
16BNC^2 for the MLP half; backward = 2x forward — the in-VMEM forward
recompute is counted as overhead, not useful work) against the v5e bf16 peak.

Usage (on chip):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_sweep.py
CPU smoke (tiny shapes, interpret-mode kernels):
  JAX_PLATFORMS=cpu python scripts/kernel_sweep.py --interpret
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

PEAK_BF16 = 197e12  # TPU v5e per-chip bf16 peak FLOP/s


def chained(fn, iters):
    """Chain iters data-dependent calls inside one jit (axon timing rule)."""

    @jax.jit
    def run(x, *rest):
        def body(carry, _):
            out = fn(x * (1.0 + 1e-6 * carry), *rest)
            return jnp.mean(out).astype(jnp.bfloat16), None

        final, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return final

    return run


def time_chained(fn, iters, repeats, *args):
    run = chained(fn, iters)
    float(run(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(run(*args))
        best = min(best, time.time() - t0)
    return best / iters


def make_params(key, c, hidden, dtype):
    ks = jax.random.split(key, 12)
    n = iter(ks)

    def w(shape, scale=0.02):
        return (scale * jax.random.normal(next(n), shape)).astype(dtype)

    return {
        "ln1_scale": jnp.ones((c,), dtype), "ln1_bias": jnp.zeros((c,), dtype),
        "wqkv": w((c, 3 * c)), "bqkv": jnp.zeros((3 * c,), dtype),
        "wproj": w((c, c)), "bproj": jnp.zeros((c,), dtype),
        "ln2_scale": jnp.ones((c,), dtype), "ln2_bias": jnp.zeros((c,), dtype),
        "w1": w((c, hidden)), "b1": jnp.zeros((hidden,), dtype),
        "w2": w((hidden, c)), "b2": jnp.zeros((c,), dtype),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--train-batch", type=int, default=128)
    p.add_argument("--embed-dim", type=int, default=384)
    p.add_argument("--num-heads", type=int, default=6)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--seq-lens", type=int, nargs="+",
                   default=[197, 138, 97, 68])
    p.add_argument("--block-batches", type=int, nargs="+",
                   default=[2, 4, 8, 16])
    p.add_argument("--kernels", nargs="+",
                   default=["attn", "mlp", "block", "block_bwd"],
                   choices=["attn", "mlp", "block", "block_bwd"])
    p.add_argument("--interpret", action="store_true",
                   help="CPU smoke: tiny shapes, interpret-mode kernels")
    args = p.parse_args()

    from dense2sparse_vit_tpu.ops.pallas import (
        fused_attention_block,
        fused_mlp_residual,
    )
    from dense2sparse_vit_tpu.ops.pallas.block import (
        fused_transformer_block,
        fused_transformer_block_backward,
    )

    if args.interpret:
        args.batch = args.train_batch = 8
        args.seq_lens = [32]
        args.block_batches = [2, 4]
        args.iters, args.repeats = 2, 1

    c, h = args.embed_dim, args.num_heads
    hidden = 4 * c
    dtype = jnp.bfloat16
    params = make_params(jax.random.PRNGKey(0), c, hidden, dtype)
    interp = args.interpret

    rows = ["| kernel | B | N | block_batch | ms/call | MFU |",
            "|---|---|---|---|---|---|"]
    best = {}

    def record(kind, B, N, nb, ms, flops):
        mfu = flops / (ms / 1e3) / PEAK_BF16
        rows.append(
            f"| {kind} | {B} | {N} | {nb} | {ms * 1e3:.3f} | {mfu:.1%} |"
        )
        k = (kind, N)
        if k not in best or ms < best[k][1]:
            best[k] = (nb, ms)
        print(rows[-1], flush=True)

    for N in args.seq_lens:
        xi = (0.02 * jax.random.normal(
            jax.random.PRNGKey(1), (args.batch, N, c))).astype(dtype)
        xt = xi[: args.train_batch]
        g = jnp.ones_like(xt)
        f_attn = 8 * args.batch * N * c * c + 4 * args.batch * N * N * c
        f_mlp = 16 * args.batch * N * c * c
        scale_t = args.train_batch / args.batch
        for nb in args.block_batches:
            if "attn" in args.kernels:
                ms = time_chained(
                    lambda x, pr: fused_attention_block(
                        x, pr["ln1_scale"], pr["ln1_bias"], pr["wqkv"],
                        pr["bqkv"], pr["wproj"], pr["bproj"], h,
                        block_batch=nb, interpret=interp),
                    args.iters, args.repeats, xi, params) * 1e3
                record("attn_half_fwd", args.batch, N, nb, ms, f_attn)
            if "mlp" in args.kernels:
                ms = time_chained(
                    lambda x, pr: fused_mlp_residual(
                        x, pr["ln2_scale"], pr["ln2_bias"], pr["w1"],
                        pr["b1"], pr["w2"], pr["b2"], block_batch=nb,
                        interpret=interp),
                    args.iters, args.repeats, xi, params) * 1e3
                record("mlp_half_fwd", args.batch, N, nb, ms, f_mlp)
            if "block" in args.kernels:
                ms = time_chained(
                    lambda x, pr: fused_transformer_block(
                        x, pr, h, block_batch=nb, interpret=interp),
                    args.iters, args.repeats, xi, params) * 1e3
                record("block_fwd", args.batch, N, nb, ms, f_attn + f_mlp)
            if "block_bwd" in args.kernels:
                ms = time_chained(
                    lambda x, gg, pr: fused_transformer_block_backward(
                        x, gg, pr, h, block_batch=nb, interpret=interp)[0],
                    args.iters, args.repeats, xt, g, params) * 1e3
                record("block_bwd", args.train_batch, N, nb, ms,
                       2 * (f_attn + f_mlp) * scale_t)

    rows.append("")
    rows.append("Best block_batch per (kernel, N): "
                + ", ".join(f"{k[0]}@N={k[1]}: nb={v[0]}"
                            for k, v in sorted(best.items())))
    text = "\n".join(rows)
    print("\n" + text.rsplit("\n", 2)[-1])
    with open("/tmp/kernel_sweep.md", "w") as f:
        f.write(text + "\n")


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    main()
