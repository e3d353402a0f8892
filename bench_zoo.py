"""Throughput sweep over the BASELINE.json config families (inference, one
chip). Not wired to the driver (bench.py is the headline); prints one JSON
line per config.

Covers:
  1. DeiT-Tiny dense forward (BASELINE config 1)
  2. DeiT-S diff-pruning student, 3-stage 0.7 schedule (config 2/3 shape)
  3. DynamicViT-baseline student, eval hard-gather path (config 3)
  4. pruned T2T-ViT-14, performer stem (config 4)
  5. DINO-backbone perturbed-top-k student (config 5; inference path)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 128
ITERS = 50  # ~24 ms flat relay readback; 50 iters amortize it to ~0.5 ms/iter


def chained(apply_fn):
    @jax.jit
    def run(params, x):
        def body(carry, _):
            out = apply_fn(params, x * (1.0 + 1e-6 * carry))
            return jnp.mean(out).astype(jnp.bfloat16), None

        final, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=ITERS)
        return final

    return run


def time_fn(run, params, x):
    float(run(params, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(run(params, x))
        best = min(best, time.time() - t0)
    return best / ITERS


def main():
    from dense2sparse_vit_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from dense2sparse_vit_tpu.models import create_model

    images = jax.random.normal(
        jax.random.PRNGKey(0), (BATCH, 224, 224, 3), jnp.bfloat16
    )
    common = dict(dtype="bfloat16", use_fused_attention=True)
    prune = dict(pruning_locs=(3, 6, 9), keep_ratios=(0.7, 0.49, 0.343))

    configs = [
        (
            "deit_tiny dense forward",
            create_model("deit_tiny_patch16_224", **common),
            lambda m: (lambda p, x: m.apply(p, x)),
        ),
        (
            "deit_small diff-pruning student (0.7^k @ 3/6/9)",
            create_model(
                "dynamic_vit_small_patch16_224_student", **common, **prune
            ),
            lambda m: (
                lambda p, x: m.apply(p, x, collect_cls_attns=False).logits
            ),
        ),
        (
            "DynamicViT-baseline student, eval hard-gather",
            create_model(
                "default_dynamic_vit_small_patch16_224_student",
                **common, **prune,
            ),
            lambda m: (lambda p, x: m.apply(p, x, training=False).logits),
        ),
        (
            "pruned T2T-ViT-14 (performer stem, 0.7^k @ 3/6/9)",
            create_model("t2t_vit_14_student", **common, **prune),
            lambda m: (
                lambda p, x: m.apply(p, x, collect_cls_attns=False).logits
            ),
        ),
        (
            "DINO-backbone perturbed-top-k student",
            create_model("dino_small_student", **common, **prune),
            lambda m: (
                lambda p, x: m.apply(p, x, collect_cls_attns=False).logits
            ),
        ),
    ]
    for name, model, fn_of in configs:
        params = model.init(jax.random.PRNGKey(1), images[:1])
        t = time_fn(chained(fn_of(model)), params, images)
        print(
            json.dumps(
                {
                    "metric": f"images/sec/chip ({name}, 224px, bf16)",
                    "value": round(BATCH / t, 1),
                    "unit": "images/sec/chip",
                    "ms_per_batch": round(t * 1e3, 2),
                    "batch": BATCH,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
