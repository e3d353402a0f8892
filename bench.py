"""Benchmark: pruned-student inference throughput vs dense ViT, per chip.

Prints ONE JSON line:
  {"metric": "images/sec/chip (DeiT-S, keep 0.7@3/6/9, 224px, bf16)",
   "value": <pruned img/s>, "unit": "images/sec/chip",
   "vs_baseline": <pruned / dense speedup>}

Timing method: the axon relay's block_until_ready does not actually block, so
each measurement chains ITERS forwards inside one jit via lax.scan (each
iteration data-depends on the previous) and forces a scalar host readback.

Outage resilience: the axon tunnel has two observed failure modes — fast
``UNAVAILABLE`` RuntimeErrors (often transient) and indefinite hangs on the
first backend query (multi-hour relay outages; both hit at round-3 capture
time). The parent process therefore never initializes JAX: it probes the
backend in a time-bounded subprocess, runs the measurement in a watched
subprocess with bounded retries, and on persistent failure emits a
structured {"error": ...} JSON line (rc 0) instead of a traceback, so the
recorded artifact is interpretable either way.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BATCH = 256
ITERS = 50  # the axon relay costs ~24 ms per host readback; 50 chained
# iterations amortize it to ~0.5 ms/iter (at 10 it was ~2.4 ms/iter of pure
# tunnel overhead inflating every number)
REPEATS = 3


def chained(apply_fn, iters=ITERS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(params, x):
        def body(carry, _):
            out = apply_fn(params, x * (1.0 + 1e-6 * carry))
            return jnp.mean(out).astype(jnp.bfloat16), None

        final, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return final

    return run


def time_fn(run, params, x):
    float(run(params, x))  # compile + warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        float(run(params, x))
        best = min(best, time.time() - t0)
    return best / ITERS


def main():
    from dense2sparse_vit_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dense2sparse_vit_tpu.models import create_model

    student = create_model(
        "dynamic_vit_small_patch16_224_student",
        pruning_locs=(3, 6, 9),
        keep_ratios=(0.7, 0.49, 0.343),
        dtype="bfloat16",
        use_fused_attention=True,
    )
    # the baseline to beat: a dense ViT-S computed the way the reference
    # computes it — unfused attention with fp32-softmax probabilities
    # materialized (dynamic_vit.py:195-236's computation graph), same
    # weights/architecture, pruning off
    student_ref_style = create_model(
        "dynamic_vit_small_patch16_224_student",
        pruning_locs=(3, 6, 9),
        keep_ratios=(0.7, 0.49, 0.343),
        dtype="bfloat16",
        use_fused_attention=False,
    )

    images = jax.random.normal(
        jax.random.PRNGKey(0), (BATCH, 224, 224, 3), jnp.bfloat16
    )
    sp = student.init(jax.random.PRNGKey(1), images[:1])

    run_pruned = chained(
        lambda p, x: student.apply(p, x, collect_cls_attns=False).logits
    )
    # equally-optimized dense: same fused kernels, pruning off
    run_dense_opt = chained(
        lambda p, x: student.apply(
            p, x, unpruned=True, collect_cls_attns=False
        ).logits
    )
    run_dense_ref = chained(
        lambda p, x: student_ref_style.apply(
            p, x, unpruned=True, collect_cls_attns=False
        ).logits
    )

    # headline config: the reference's --small-predictor scoring head
    # (utils.py:271-272) — the throughput deployment configuration; the
    # default large-predictor numbers are reported in extra
    student_small_pred = create_model(
        "dynamic_vit_small_patch16_224_student",
        pruning_locs=(3, 6, 9),
        keep_ratios=(0.7, 0.49, 0.343),
        dtype="bfloat16",
        use_fused_attention=True,
        small_predictor=True,
    )
    sp_small = student_small_pred.init(jax.random.PRNGKey(1), images[:1])
    run_small = chained(
        lambda p, x: student_small_pred.apply(
            p, x, collect_cls_attns=False
        ).logits
    )

    t_pruned = time_fn(run_pruned, sp, images)
    t_dense_opt = time_fn(run_dense_opt, sp, images)
    t_dense_ref = time_fn(run_dense_ref, sp, images)
    t_small = time_fn(run_small, sp_small, images)

    print(
        json.dumps(
            {
                "metric": (
                    "images/sec/chip (DeiT-S diff-pruning student, "
                    "keep 0.7/0.49/0.343 @ layers 3/6/9, --small-predictor "
                    "head, 224px, bf16)"
                ),
                "value": round(BATCH / t_small, 1),
                "unit": "images/sec/chip",
                # speedup over the dense ViT as the reference implements it
                "vs_baseline": round(t_dense_ref / t_small, 3),
                "extra": {
                    "dense_ref_style_images_per_sec": round(
                        BATCH / t_dense_ref, 1
                    ),
                    "dense_equally_optimized_images_per_sec": round(
                        BATCH / t_dense_opt, 1
                    ),
                    "large_predictor_images_per_sec": round(
                        BATCH / t_pruned, 1
                    ),
                    "large_predictor_vs_ref_dense": round(
                        t_dense_ref / t_pruned, 3
                    ),
                    "speedup_vs_equally_optimized_dense_large_pred": round(
                        t_dense_opt / t_pruned, 3
                    ),
                    "batch": BATCH,
                    "small_pred_ms_per_batch": round(t_small * 1e3, 2),
                },
            }
        )
    )


_CHILD_MARK = "_D2S_BENCH_CHILD"

# knobs overridable from the environment (used by tests to bound runtimes)
PROBE_TIMEOUT = int(os.environ.get("D2S_BENCH_PROBE_TIMEOUT", "120"))
RUN_TIMEOUT = int(os.environ.get("D2S_BENCH_RUN_TIMEOUT", "1500"))
ATTEMPTS = int(os.environ.get("D2S_BENCH_ATTEMPTS", "3"))
RETRY_SLEEP = int(os.environ.get("D2S_BENCH_RETRY_SLEEP", "30"))
# worst case when the tunnel is fully down: 3 x 120s probes + 2 x 30s sleeps
# = 7 min, inside the driver's observed ~10 min artifact budget

_PROBE_CODE = (
    "import jax, jax.numpy as jnp;"
    "print(jax.devices());"
    "print('PROBE_OK', float(jnp.ones((128, 128)).sum()))"
)


def _probe_backend(timeout: int) -> tuple[bool, str]:
    """Run a tiny op on the ambient backend in a time-bounded subprocess."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe hang (> {timeout}s): relay not responding"
    if r.returncode != 0 or "PROBE_OK" not in r.stdout:
        tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
        return False, f"probe rc={r.returncode}: {' '.join(tail)[:300]}"
    return True, "ok"


def _run_child(timeout: int) -> tuple[dict | None, str]:
    """Run the measurement in a watched subprocess; return (json, reason)."""
    env = dict(os.environ)
    env[_CHILD_MARK] = "1"
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True,
            text=True,
            timeout=timeout,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return None, f"bench hang (> {timeout}s)"
    for line in reversed(r.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line), "ok"
            except json.JSONDecodeError:
                break
    tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
    return None, f"bench rc={r.returncode}: {' '.join(tail)[:300]}"


def _parent_main() -> int:
    """Probe → run → retry loop; always exits 0 with ONE JSON line."""
    failures: list[str] = []
    any_probe_ok = False
    for attempt in range(ATTEMPTS):
        if attempt:
            time.sleep(RETRY_SLEEP)
        ok, reason = _probe_backend(PROBE_TIMEOUT)
        if not ok:
            failures.append(f"attempt {attempt + 1}: {reason}")
            continue
        any_probe_ok = True
        result, reason = _run_child(RUN_TIMEOUT)
        if result is not None:
            print(json.dumps(result))
            return 0
        failures.append(f"attempt {attempt + 1}: {reason}")
    # attribute the failure honestly: "outage" only when the backend never
    # even answered a probe — a reachable backend with a failing bench child
    # is a bench/code regression, not infrastructure downtime
    error = (
        "bench run failed with backend reachable (not an outage; "
        "see attempts)"
        if any_probe_ok
        else "axon TPU backend unavailable (tunnel outage)"
    )
    print(
        json.dumps(
            {
                "metric": (
                    "images/sec/chip (DeiT-S diff-pruning student, "
                    "keep 0.7/0.49/0.343 @ layers 3/6/9, --small-predictor "
                    "head, 224px, bf16)"
                ),
                "value": None,
                "unit": "images/sec/chip",
                "vs_baseline": None,
                "error": error,
                "attempts": failures,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if os.environ.get(_CHILD_MARK) == "1":
        main()
    else:
        sys.exit(_parent_main())
