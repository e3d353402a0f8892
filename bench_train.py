"""Training-step benchmark (not wired to the driver; see bench.py for the
headline inference metric).

Measures the FULL jitted training step — teacher forward (with per-block CLS
attention capture), student forward, MaskLoss + BackboneLoss, backward, AdamW
update — for the flagship DeiT-S 3-stage config. Sequential steps thread the
donated TrainState, so timing needs no scan-chain trick.

Measured on a v5e chip (B=128, bf16): 61.1 ms/step (2095 img/s) with the
fully fused path (Pallas forward AND backward kernels) vs 85.7 ms/step
(1493 img/s) with the reference-style unfused path.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

B = 128
STEPS = 10


def run(fused: bool) -> float:
    from dense2sparse_vit_tpu.core.config import (
        ExperimentConfig,
        PruningConfig,
        TrainConfig,
        deit_small,
    )
    from dense2sparse_vit_tpu.models import DiffPruningStudent, ViTTeacher
    from dense2sparse_vit_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    mcfg = deit_small(dtype="bfloat16", use_fused_attention=fused)
    cfg = ExperimentConfig(
        model=mcfg,
        pruning=PruningConfig(
            pruning_locs=(3, 6, 9), keep_ratios=(0.7, 0.49, 0.343)
        ),
        train=TrainConfig(batch_size=B, epochs=25, warmup_epochs=5),
    )
    student = DiffPruningStudent(cfg=mcfg, pruning=cfg.pruning)
    teacher = ViTTeacher(cfg=mcfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (B, 224, 224, 3),
                             jnp.bfloat16)
    labels = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, 1000)
    tx = make_optimizer(cfg.train, steps_per_epoch=100)
    state = create_train_state(student, tx, jax.random.PRNGKey(2), imgs[:1])
    tparams = teacher.init(jax.random.PRNGKey(3), imgs[:1])["params"]
    step = jax.jit(
        make_train_step(student, teacher, tx, cfg), donate_argnums=(0,)
    )

    state, m = step(state, tparams, imgs, labels, jax.random.PRNGKey(4),
                    jnp.float32(6.0))
    float(m["loss"])  # warm + sync
    t0 = time.time()
    for i in range(STEPS):
        state, m = step(
            state, tparams, imgs, labels,
            jax.random.fold_in(jax.random.PRNGKey(5), i), jnp.float32(6.0),
        )
    float(m["loss"])  # state threading makes the chain sequential
    return (time.time() - t0) / STEPS


def main():
    t_fused = run(True)
    t_ref = run(False)
    print(
        json.dumps(
            {
                "metric": "training images/sec/chip (DeiT-S 3-stage student "
                          "+ teacher + losses + AdamW, B=128, bf16)",
                "value": round(B / t_fused, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(t_ref / t_fused, 3),
                "extra": {
                    "fused_ms_per_step": round(t_fused * 1e3, 1),
                    "unfused_ms_per_step": round(t_ref * 1e3, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    main()
