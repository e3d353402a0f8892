"""Per-kernel device-time roofline profile of the flagship graphs.

Captures jax.profiler traces ON THE REAL CHIP for
  * equally-optimized dense DeiT-S forward (B=256, bf16)
  * pruned 3-stage student forward, --small-predictor (B=256, bf16)
  * full training step, topk mode (B=128, bf16)
then aggregates the device-side "XLA Ops" timeline per op name and prints a
per-kernel table (time/iter, share) — the TPU equivalent of the reference's
paired CUDA-event breakdown (/root/reference/evaluate.py:87-178), but from
the XLA device timeline instead of host events.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_roofline.py
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import sys

import jax
import jax.numpy as jnp

BATCH = 256
TRAIN_B = 128
ITERS = 10


def _chained(apply_fn, iters=ITERS):
    @jax.jit
    def run(params, x):
        def body(carry, _):
            out = apply_fn(params, x * (1.0 + 1e-6 * carry))
            return jnp.mean(out).astype(jnp.bfloat16), None

        final, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return final

    return run


def _trace(tag: str, thunk):
    """Run thunk under a fresh trace dir; return aggregated device op rows."""
    tdir = f"/tmp/roofline/{tag}"
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        thunk()
    files = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    assert files, f"no trace produced under {tdir}"
    return _aggregate(files[0])


def _aggregate(path: str):
    d = json.load(gzip.open(path))
    ev = d.get("traceEvents", [])
    # map pid -> process name, (pid, tid) -> thread name
    pnames, tnames = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    rows = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pnames.get(e.get("pid"), ""):
            continue
        if tnames.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        name = e["name"]
        # scan-loop parent ops ("while.N") span every iteration and would
        # double-count all their children (observed: +100% on the fwd
        # graphs); exclude them from rows AND total
        if name.split(".")[0] in ("while", "conditional"):
            continue
        dur = float(e.get("dur", 0.0))
        rows[name] += dur
        counts[name] += 1
        total += dur
    return rows, counts, total


def _report(tag: str, rows, counts, total, iters, out):
    out.append(f"\n### {tag}  (device XLA-op time {total/1e3:.2f} ms total, "
               f"{total/1e3/iters:.3f} ms/iter over {iters} iters)\n")
    out.append("| op | calls/iter | us/iter | share |")
    out.append("|---|---|---|---|")
    for name, dur in rows.most_common(25):
        out.append(
            f"| `{name[:70]}` | {counts[name]/iters:.0f} "
            f"| {dur/iters:.0f} | {100*dur/total:.1f}% |"
        )


def main():
    from dense2sparse_vit_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from dense2sparse_vit_tpu.core.config import (
        ExperimentConfig, PruningConfig, TrainConfig, deit_small,
    )
    from dense2sparse_vit_tpu.models import DiffPruningStudent, ViTTeacher, create_model
    from dense2sparse_vit_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )

    out = ["# Roofline profile (real chip, jax.profiler device timeline)"]

    images = jax.random.normal(
        jax.random.PRNGKey(0), (BATCH, 224, 224, 3), jnp.bfloat16
    )

    student = create_model(
        "dynamic_vit_small_patch16_224_student",
        pruning_locs=(3, 6, 9), keep_ratios=(0.7, 0.49, 0.343),
        dtype="bfloat16", use_fused_attention=True, small_predictor=True,
    )
    sp = student.init(jax.random.PRNGKey(1), images[:1])

    run_dense = _chained(
        lambda p, x: student.apply(
            p, x, unpruned=True, collect_cls_attns=False
        ).logits
    )
    run_pruned = _chained(
        lambda p, x: student.apply(p, x, collect_cls_attns=False).logits
    )

    # warm/compile OUTSIDE the trace
    float(run_dense(sp, images))
    rows, counts, total = _trace("dense", lambda: float(run_dense(sp, images)))
    _report("dense equally-optimized fwd B=256", rows, counts, total, ITERS, out)

    float(run_pruned(sp, images))
    rows, counts, total = _trace("pruned", lambda: float(run_pruned(sp, images)))
    _report("pruned 3-stage small-pred fwd B=256", rows, counts, total, ITERS, out)

    # ---- training step ----
    mcfg = deit_small(dtype="bfloat16", use_fused_attention=True)
    cfg = ExperimentConfig(
        model=mcfg,
        pruning=PruningConfig(pruning_locs=(3, 6, 9),
                              keep_ratios=(0.7, 0.49, 0.343)),
        train=TrainConfig(batch_size=TRAIN_B, epochs=25, warmup_epochs=5),
    )
    teacher = ViTTeacher(cfg=mcfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (TRAIN_B, 224, 224, 3),
                             jnp.bfloat16)
    labels = jax.random.randint(jax.random.PRNGKey(1), (TRAIN_B,), 0, 1000)
    tparams = teacher.init(jax.random.PRNGKey(3), imgs[:1])["params"]
    tx = make_optimizer(cfg.train, steps_per_epoch=100)
    st_model = DiffPruningStudent(cfg=mcfg, pruning=cfg.pruning)
    state = create_train_state(st_model, tx, jax.random.PRNGKey(2), imgs[:1])
    step = jax.jit(make_train_step(st_model, teacher, tx, cfg),
                   donate_argnums=(0,))
    state, m = step(state, tparams, imgs, labels, jax.random.PRNGKey(4),
                    jnp.float32(6.0))
    float(m["loss"])

    steps = 3

    def train_thunk():
        nonlocal state
        for i in range(steps):
            state, mm = step(state, tparams, imgs, labels,
                             jax.random.fold_in(jax.random.PRNGKey(5), i),
                             jnp.float32(6.0))
        float(mm["loss"])

    rows, counts, total = _trace("train", train_thunk)
    _report(f"train step topk B={TRAIN_B}", rows, counts, total, steps, out)

    text = "\n".join(out)
    print(text)
    with open("/tmp/roofline_report.md", "w") as f:
        f.write(text)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
