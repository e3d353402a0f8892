"""Profiling: per-module latency breakdown + XLA FLOP analysis + traces.

Parity:
  - evaluate_timing (/root/reference/evaluate.py:87-178): paired CUDA-event
    per-module latency breakdown (patch-embed / encoder blocks / predictor /
    head). TPU version: each module is timed as its own jitted function with
    a scan-chain (the axon relay's block_until_ready does not block, so
    naive event timing is meaningless — see .claude/skills/verify/SKILL.md).
  - FLOP counting via fvcore (commented at train.py:33-37): replaced by
    XLA's own HLO cost analysis, reported as a pruned/dense GFLOP ratio.
  - torch.profiler-style traces: jax.profiler.trace wrapper.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from dense2sparse_vit_tpu.core.config import ModelConfig, PruningConfig
from dense2sparse_vit_tpu.nn.layers import Block, PatchEmbed
from dense2sparse_vit_tpu.nn.predictor import PredictorLG


def time_jitted(fn: Callable, *args, iters: int = 10, repeats: int = 3) -> float:
    """Steady-state seconds per call of `fn(*args)` (relay-safe timing):
    chains `iters` calls inside one jit with a data dependency, forces a
    scalar readback, returns best-of-repeats / iters."""

    @jax.jit
    def run(*a):
        def body(carry, _):
            out = fn(jax.tree_util.tree_map(lambda t: t * (1 + 1e-6 * carry), a[0]),
                     *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.mean(leaf).astype(jnp.float32), None

        final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return final

    float(run(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(run(*args))
        best = min(best, time.time() - t0)
    return best / iters


def flops_of(fn: Callable, *args) -> float:
    """Total FLOPs of the compiled computation (XLA cost analysis; replaces
    the reference's fvcore FlopCountAnalysis)."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def pruned_vs_dense_flops(student, params, images, **apply_kwargs) -> Dict[str, float]:
    """GFLOPs of the pruned vs unpruned student forward and their ratio
    (the reference's commented-out fvcore report, train.py:33-37).

    apply_kwargs are forwarded to student.apply — e.g.
    collect_cls_attns=False for the diff-pruning student; the gumbel
    baseline takes no such kwarg.
    """
    pruned = flops_of(
        lambda p, x: student.apply(p, x, **apply_kwargs).logits,
        params, images,
    )
    dense = flops_of(
        lambda p, x: student.apply(p, x, unpruned=True, **apply_kwargs).logits,
        params, images,
    )
    return {
        "pruned_gflops": pruned / 1e9,
        "dense_gflops": dense / 1e9,
        "flop_ratio": pruned / max(dense, 1.0),
    }


def latency_breakdown(
    model_cfg: ModelConfig,
    pruning: PruningConfig,
    batch_size: int = 64,
    iters: int = 10,
) -> Dict[str, float]:
    """Per-module latency table in ms (evaluate_timing parity).

    Times each module kind as its own jit at the shapes it actually runs at:
    patch embed, encoder blocks per pruning segment (sequence width changes
    at each stage), the score predictor per stage, and the classifier head.
    """
    dtype = jnp.dtype(model_cfg.dtype)
    rng = jax.random.PRNGKey(0)
    D = model_cfg.embed_dim
    N = model_cfg.num_patches
    out: Dict[str, float] = {}

    # patch embed
    pe = PatchEmbed(model_cfg.patch_size, D, dtype)
    imgs = jax.random.normal(
        rng, (batch_size, model_cfg.img_size, model_cfg.img_size, 3), dtype
    )
    pe_params = pe.init(rng, imgs[:1])
    out["patch_embed_ms"] = time_jitted(
        lambda x: pe.apply(pe_params, x), imgs, iters=iters
    ) * 1e3

    # encoder blocks at each segment width
    widths = [N + 1]
    for k in pruning.keep_counts(N):
        widths.append(k + 1)
    locs = list(pruning.pruning_locs) + [model_cfg.depth]
    seg_counts = [locs[0]] + [locs[i + 1] - locs[i] for i in range(len(locs) - 1)]

    blk = Block(
        num_heads=model_cfg.num_heads,
        mlp_ratio=model_cfg.mlp_ratio,
        qkv_bias=model_cfg.qkv_bias,
        dtype=dtype,
        use_fused=model_cfg.use_fused_attention,
    )
    encoder_total = 0.0
    for w, count in zip(widths, seg_counts):
        x = jax.random.normal(rng, (batch_size, w, D), dtype)
        bp = blk.init(rng, x[:1])
        ms = time_jitted(lambda t: blk.apply(bp, t), x, iters=iters) * 1e3
        out[f"block_ms_at_{w}_tokens"] = ms
        encoder_total += ms * count
    out["encoder_ms"] = encoder_total

    # predictor per stage
    pred = PredictorLG(
        embed_dim=D,
        small_predictor=pruning.small_predictor,
        use_bn=pruning.predictor_bn,
        loss_type=pruning.mask_loss_type,
        dtype=dtype,
    )
    predictor_total = 0.0
    stage_widths = [N] + [k for k in pruning.keep_counts(N)][:-1]
    for w in stage_widths:
        x = jax.random.normal(rng, (batch_size, w, D), dtype)
        pp = pred.init(rng, x[:1])
        predictor_total += time_jitted(
            lambda t: pred.apply(pp, t)[0], x, iters=iters
        ) * 1e3
    out["predictor_ms"] = predictor_total

    # head
    w_head = jax.random.normal(rng, (D, model_cfg.num_classes), dtype)
    cls = jax.random.normal(rng, (batch_size, D), dtype)
    out["head_ms"] = time_jitted(lambda c: c @ w_head, cls, iters=iters) * 1e3

    out["total_ms"] = (
        out["patch_embed_ms"] + out["encoder_ms"] + out["predictor_ms"]
        + out["head_ms"]
    )
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (TensorBoard-viewable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
