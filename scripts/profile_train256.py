"""Device-timeline profile of THE round-5 target row: the flagship topk
train step, B=256, cached teacher (bench_train.py's B256_cached_teacher).

Prints (a) the top-40 XLA ops by device time and (b) category sums
(student block fwd/bwd, predictors, loss/glue fusions, optimizer-ish,
copies/selects, rest) so the remaining glue tail vs the 85.3 ms target
(3000 img/s) is attributable. Same timeline plumbing as
scripts/profile_roofline.py (the reference's CUDA-event breakdown,
/root/reference/evaluate.py:87-178, rebuilt on the XLA device timeline).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train256.py
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys

import jax
import jax.numpy as jnp

BATCH = 256
STEPS = 4


def _aggregate(path: str):
    d = json.load(gzip.open(path))
    ev = d.get("traceEvents", [])
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
        if name.split(".")[0] in ("while", "conditional"):
            continue
        dur = float(e.get("dur", 0.0))
        rows[name] += dur
        counts[name] += 1
        total += dur
    return rows, counts, total


def _category(name: str) -> str:
    base = name.split(".")[0]
    if re.match(r"blocks_\d+$", base):
        return "student blocks (fwd+bwd kernels)"
    if base.startswith("score_predictor"):
        return "score predictors"
    if base in ("DiffPruningStudent", "ViTTeacher"):
        return "model glue (named scopes)"
    if "fusion" in base or base in ("broadcast_select_fusion", "select_fusion",
                                    "loop_fusion", "input_fusion",
                                    "output_fusion"):
        return "XLA fusions (loss/opt/glue)"
    if base in ("copy", "copy-start", "copy-done", "bitcast", "transpose",
                "reshape"):
        return "copies/layout"
    if base in ("convolution", "dot", "custom-call"):
        return "raw dots/convs/custom-calls"
    if base.startswith(("all-reduce", "reduce", "sort", "scatter", "gather",
                        "dynamic")):
        return "reduce/sort/gather"
    return "other"


def main():
    from dense2sparse_vit_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    from dense2sparse_vit_tpu.core.config import (
        ExperimentConfig, PruningConfig, TrainConfig, deit_small,
    )
    from dense2sparse_vit_tpu.models import DiffPruningStudent, ViTTeacher
    from dense2sparse_vit_tpu.train import (
        create_train_state, build_optimizer, make_train_step,
    )
    from dense2sparse_vit_tpu.train.teacher_cache import (
        make_teacher_outputs_fn,
    )

    mcfg = deit_small(dtype="bfloat16", use_fused_attention=True)
    cfg = ExperimentConfig(
        model=mcfg,
        pruning=PruningConfig(pruning_locs=(3, 6, 9),
                              keep_ratios=(0.7, 0.49, 0.343)),
        train=TrainConfig(batch_size=BATCH, epochs=25, warmup_epochs=5),
    )
    teacher = ViTTeacher(cfg=mcfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 224, 224, 3),
                             jnp.bfloat16)
    labels = jax.random.randint(jax.random.PRNGKey(1), (BATCH,), 0, 1000)
    tparams = teacher.init(jax.random.PRNGKey(3), imgs[:1])["params"]
    tx = build_optimizer(cfg.train, steps_per_epoch=100)
    student = DiffPruningStudent(cfg=mcfg, pruning=cfg.pruning)
    state = create_train_state(student, tx, jax.random.PRNGKey(2), imgs[:1])
    step = jax.jit(
        make_train_step(student, teacher, tx, cfg, cached_teacher=True),
        donate_argnums=(0,),
    )
    teacher_in = jax.jit(make_teacher_outputs_fn(teacher, cfg))(tparams, imgs)

    state, m = step(state, teacher_in, imgs, labels, jax.random.PRNGKey(4),
                    jnp.float32(6.0))
    float(m["loss"])  # compile + warm outside the trace

    tdir = "/tmp/roofline/train256_cached"
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        for i in range(STEPS):
            state, m = step(
                state, teacher_in, imgs, labels,
                jax.random.fold_in(jax.random.PRNGKey(5), i),
                jnp.float32(6.0),
            )
        float(m["loss"])
    files = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    assert files, f"no trace produced under {tdir}"
    rows, counts, total = _aggregate(files[0])

    print(f"# train step topk B={BATCH} cached-teacher "
          f"(device XLA-op time {total/1e3:.2f} ms total, "
          f"{total/1e3/STEPS:.3f} ms/iter over {STEPS} iters)\n")
    cats = collections.Counter()
    catn = collections.Counter()
    for name, dur in rows.items():
        cats[_category(name)] += dur
        catn[_category(name)] += counts[name]
    print("| category | ops/iter | ms/iter | share |")
    print("|---|---|---|---|")
    for cat, dur in cats.most_common():
        print(f"| {cat} | {catn[cat]/STEPS:.0f} | {dur/1e3/STEPS:.2f} "
              f"| {100*dur/total:.1f}% |")
    print("\n| op | calls/iter | us/iter | share |")
    print("|---|---|---|---|")
    for name, dur in rows.most_common(40):
        print(f"| `{name[:70]}` | {counts[name]/STEPS:.0f} "
              f"| {dur/STEPS:.0f} | {100*dur/total:.1f}% |")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
