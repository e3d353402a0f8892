"""Serving benchmark: the AOT-exported pruned student, as deployed.

Measures what a serving process actually runs — `jax.export` artifact,
deserialized WITHOUT the model code, weights baked in — across deployment
batch sizes, and compares against the live jitted apply() to show the
export path costs nothing. The reference has no serving story at all
(research scripts only, evaluate.py:87-178 is its closest analogue); this
is the TPU-native one on top of utils/export.py.

Prints ONE JSON line:
  {"metric": "serving images/sec/chip (AOT export, DeiT-S pruned, B=256)",
   "value": ..., "unit": "images/sec/chip",
   "vs_baseline": <exported / live-jit throughput ratio, ~1.0>,
   "extra": {per-batch latency table}}

Timing: the axon relay's block_until_ready does not truly block and each
host readback costs ~24 ms, so every measurement chains ITERS calls inside
one jit via lax.scan (each iteration data-depends on the previous) and
forces one scalar readback. `Exported.call` is traceable, so the exported
artifact composes into the same scan harness as the live function.

CPU smoke: JAX_PLATFORMS=cpu python bench_serve.py --smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ITERS = 50
REPEATS = 3


def chained(fn, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(carry, _):
            out = fn(x * (1.0 + 1e-6 * carry))
            return jnp.mean(out).astype(jnp.bfloat16), None

        final, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return final

    return run


def time_fn(run, x, iters, repeats):
    float(run(x))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(run(x))
        best = min(best, time.time() - t0)
    return best / iters


def main():
    from dense2sparse_vit_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+",
                   default=[1, 8, 32, 128, 256])
    p.add_argument("--headline-batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=ITERS)
    p.add_argument("--repeats", type=int, default=REPEATS)
    p.add_argument("--smoke", action="store_true",
                   help="tiny model + tiny batches for CPU CI")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dense2sparse_vit_tpu.models import create_model
    from dense2sparse_vit_tpu.utils.export import (
        export_student,
        load_exported,
    )

    if args.smoke:
        from dense2sparse_vit_tpu.core.config import (
            ModelConfig,
            PruningConfig,
        )
        from dense2sparse_vit_tpu.models import DiffPruningStudent

        cfg = ModelConfig(
            img_size=32, patch_size=8, embed_dim=16, depth=2, num_heads=2,
            num_classes=5,
        )
        student = DiffPruningStudent(
            cfg=cfg,
            pruning=PruningConfig(pruning_locs=(1,), keep_ratios=(0.5,)),
        )
        args.batches = [1, 4]
        args.headline_batch = 4
        # min-of-5 repeats: with repeats=1 the sub-ms smoke model's
        # live-vs-served ratio is pure dispatch/GC jitter on a loaded box
        args.iters, args.repeats = 2, 5
        size = 32
    else:
        # the deployment configuration bench.py headlines: DeiT-S,
        # keep 0.7/0.49/0.343 @ 3/6/9, --small-predictor head, bf16
        student = create_model(
            "dynamic_vit_small_patch16_224_student",
            pruning_locs=(3, 6, 9),
            keep_ratios=(0.7, 0.49, 0.343),
            dtype="bfloat16",
            use_fused_attention=True,
            small_predictor=True,
        )
        size = 224

    sample = jax.random.normal(
        jax.random.PRNGKey(0), (1, size, size, 3), jnp.float32
    )
    variables = student.init(jax.random.PRNGKey(1), sample)

    # ONE symbolic-batch artifact serves every batch size. Mosaic kernel
    # grids are computed from B, so if the symbolic-batch lowering is
    # rejected on this backend, fall back to one fixed-batch artifact per
    # deployment batch size and record which mode ran.
    def _fixed_exports():
        fns, total, t0 = {}, 0, time.time()
        for b in sorted(set(args.batches + [args.headline_batch])):
            fb = export_student(student, variables, batch_size=b)
            total += len(fb)
            fns[b] = load_exported(fb)
        return fns, total, time.time() - t0

    symbolic = True
    try:
        t0 = time.time()
        blob = export_student(student, variables, batch_size=None)
        export_s = time.time() - t0
        t0 = time.time()
        served_fn = load_exported(blob)
        load_s = time.time() - t0
        artifact_bytes = len(blob)
        served_for = lambda b: served_fn  # noqa: E731
    except Exception as e:  # symbolic-shape lowering rejected
        symbolic = False
        print(f"symbolic-batch export unavailable ({type(e).__name__}: "
              f"{str(e)[:200]}); falling back to fixed-batch artifacts",
              file=sys.stderr)
        fns, artifact_bytes, export_s = _fixed_exports()
        load_s = 0.0
        served_for = lambda b: fns[b]  # noqa: E731

    def live(x):
        return student.apply(
            variables, x, collect_cls_attns=False
        ).logits.astype(jnp.float32)

    table = {}
    for b in args.batches:
        xb = jax.random.normal(
            jax.random.PRNGKey(b), (b, size, size, 3), jnp.float32
        )
        t = time_fn(chained(served_for(b), args.iters), xb, args.iters,
                    args.repeats)
        table[f"B={b}"] = {
            "ms_per_batch": round(t * 1e3, 3),
            "images_per_sec": round(b / t, 1),
        }

    bh = args.headline_batch
    xh = jax.random.normal(
        jax.random.PRNGKey(bh), (bh, size, size, 3), jnp.float32
    )
    t_served = time_fn(chained(served_for(bh), args.iters), xh, args.iters,
                       args.repeats)
    t_live = time_fn(chained(live, args.iters), xh, args.iters,
                     args.repeats)

    # int8 PTQ serving row (ops/pallas/quant.py): same weights, quantized
    # projections. TPU only — the Mosaic int8 path has no CPU lowering.
    int8_row = None
    if not args.smoke and jax.default_backend() != "cpu":
        try:
            q_student = create_model(
                "dynamic_vit_small_patch16_224_student",
                pruning_locs=(3, 6, 9),
                keep_ratios=(0.7, 0.49, 0.343),
                dtype="bfloat16",
                use_fused_attention=True,
                small_predictor=True,
                quant="int8",
            )

            def live_q(x):
                return q_student.apply(
                    variables, x, collect_cls_attns=False
                ).logits.astype(jnp.float32)

            t_q = time_fn(chained(live_q, args.iters), xh, args.iters,
                          args.repeats)
            int8_row = {
                "images_per_sec": round(bh / t_q, 1),
                "ms_per_batch": round(t_q * 1e3, 3),
                "speedup_vs_bf16_live": round(t_live / t_q, 3),
            }
        except Exception as e:
            int8_row = {"error": f"{type(e).__name__}: {str(e)[:300]}"}

    print(json.dumps({
        "metric": (
            "serving images/sec/chip (AOT jax.export artifact, DeiT-S "
            f"diff-pruning student, small predictor, bf16, B={bh})"
        ),
        "value": round(bh / t_served, 1),
        "unit": "images/sec/chip",
        # vs the live jitted apply: export should be free (~1.0)
        "vs_baseline": round(t_live / t_served, 3),
        "extra": {
            "artifact_bytes": artifact_bytes,
            "symbolic_batch": symbolic,
            "export_seconds": round(export_s, 2),
            "deserialize_seconds": round(load_s, 3),
            "live_jit_images_per_sec": round(bh / t_live, 1),
            "int8_ptq": int8_row,
            "per_batch": table,
        },
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
